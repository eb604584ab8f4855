"""Image IO: PIL-based loading and torchvision-style grid saving.

Replaces the reference's torchvision/cv2 IO (training_utils.py:10-15
``imgPath2loader``, torchvision.utils.save_image grids). All tensors NHWC;
[-1, 1] range inside the models, [0, 1] at the file boundary.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np
from PIL import Image


def load_image(path, size: int | None = None) -> np.ndarray:
    """PNG/JPG -> [H, W, 3] float32 in [0, 1] (resized like the reference's
    PIL ``resize`` when ``size`` is given)."""
    img = Image.open(path).convert("RGB")
    if size is not None:
        img = img.resize((size, size))
    return np.asarray(img, dtype=np.float32) / 255.0


def load_image_dir(path, size: int | None = None) -> np.ndarray:
    """Directory of images -> [N, H, W, 3] in [0, 1], sorted by filename."""
    files = sorted(
        f for f in os.listdir(path) if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    if not files:
        raise FileNotFoundError(f"no images under {path}")
    return np.stack([load_image(os.path.join(path, f), size) for f in files])


def save_image(path, img: np.ndarray) -> None:
    """[H, W, 3] in [0, 1] -> file."""
    arr = np.clip(np.asarray(img) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    Image.fromarray(arr).save(path)


def save_image_grid(path, imgs: np.ndarray, nrow: int = 8, padding: int = 2) -> None:
    """[N, H, W, 3] in [0, 1] -> one grid image (torchvision save_image
    semantics: ``nrow`` images per row, zero padding)."""
    imgs = np.asarray(imgs)
    n, h, w, c = imgs.shape
    ncol = min(nrow, n)
    nrows = -(-n // ncol)
    grid = np.zeros(
        (nrows * h + padding * (nrows + 1), ncol * w + padding * (ncol + 1), c),
        dtype=np.float32,
    )
    for idx in range(n):
        r, col = divmod(idx, ncol)
        y = padding + r * (h + padding)
        x = padding + col * (w + padding)
        grid[y : y + h, x : x + w] = imgs[idx]
    save_image(path, grid)


def to_unit(images) -> np.ndarray:
    """[-1, 1] model range -> [0, 1] file range (img*0.5+0.5,
    synthesized_IMG.py:146)."""
    return np.asarray(images) * 0.5 + 0.5


def from_unit(images) -> np.ndarray:
    """[0, 1] file range -> [-1, 1] model range."""
    return np.asarray(images) * 2.0 - 1.0
