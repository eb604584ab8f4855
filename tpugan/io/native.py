"""ctypes bindings for the native (C++) threaded image loader.

``native/tpugan_io.cpp`` decodes PNG batches in parallel worker threads
(libpng + zlib) straight into a float32 NHWC buffer — the TPU-native
replacement for the reference's one-at-a-time PIL loop
(training_utils.py:10-15). Falls back to the PIL path transparently when
the shared library is missing and cannot be built.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parents[2] / "native"
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _lib_path() -> pathlib.Path:
    # TPUGAN_NATIVE_LIB lets an installed (wheel) tpugan point at a
    # prebuilt library; the default is the source checkout's native/ dir.
    env = os.environ.get("TPUGAN_NATIVE_LIB")
    return pathlib.Path(env) if env else _NATIVE_DIR / "libtpugan_io.so"


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        path = _lib_path()
        if not path.exists() and path.parent == _NATIVE_DIR:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)], check=True, capture_output=True
            )
        lib = ctypes.CDLL(str(path))
        lib.tg_decode_png.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.tg_decode_png.restype = ctypes.c_int
        lib.tg_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
        ]
        lib.tg_load_batch.restype = ctypes.c_int
        _lib = lib
    except Exception:
        _load_failed = True
    return _lib


def available() -> bool:
    return _get_lib() is not None


def load_png_batch(paths, size: int, n_threads: int = 8) -> np.ndarray:
    """paths -> [N, size, size, 3] float32 in [0, 1] (parallel decode)."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(paths)
    out = np.empty((n, size, size, 3), dtype=np.float32)
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    rc = lib.tg_load_batch(
        arr, n, size, size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_threads,
    )
    if rc != 0:
        raise IOError(f"native PNG batch decode failed (code {rc})")
    return out


def load_image_dir_fast(path, size: int, n_threads: int = 8) -> np.ndarray:
    """Directory -> [N, size, size, 3]; native for all-PNG dirs, PIL fallback."""
    from tpugan.io.image import load_image_dir

    files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    if not files:
        raise FileNotFoundError(f"no images under {path}")
    if available() and all(f.lower().endswith(".png") for f in files):
        try:
            return load_png_batch(files, size, n_threads)
        except IOError:
            pass
    return load_image_dir(path, size)
