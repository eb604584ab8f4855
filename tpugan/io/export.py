"""Ahead-of-time export of jitted tpugan functions (serving artifacts).

The reference deploys by shipping the Python model code plus torch
checkpoints (readme.md:65-83) — there is no serving-export story. Here
any jitted inference path (frozen synthesis, an encoder forward, a whole
inversion chunk) can be serialized to a portable StableHLO artifact via
``jax.export`` and reloaded WITHOUT the model code or its weights-as-
arguments re-threading — the TPU-native analog of a TorchScript /
SavedModel export:

    synth = lambda z: gen.apply(frozen, z, lod)   # weights closed over
    blob  = export_jit(synth, z_example)          # bytes
    ...ship blob to the serving fleet...
    f = load_exported(blob)                       # callable, no tpugan
    imgs = f(z)

Artifacts record the lowering platform(s); pass ``platforms=("tpu",)``
(or ``("cpu", "tpu")`` for a dual-platform artifact) when exporting on a
machine other than the serving target.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import export as _jax_export


def _specs(tree):
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)), tree
    )


def export_jit(
    fn: Callable,
    *example_args,
    platforms: Optional[Sequence[str]] = None,
) -> bytes:
    """Serialize ``fn(*example_args)`` to a StableHLO artifact (bytes).

    ``fn`` may be a plain function (jitted here) or an existing
    ``jax.jit`` wrapper. Weights should be closed over — they are baked
    into the artifact as constants, making it self-contained.
    """
    jitted = fn if isinstance(fn, jax.stages.Wrapped) else jax.jit(fn)
    kwargs = {"platforms": tuple(platforms)} if platforms else {}
    exported = _jax_export.export(jitted, **kwargs)(*_specs(example_args))
    return bytes(exported.serialize())


def load_exported(data: bytes) -> Callable:
    """Deserialize an ``export_jit`` artifact into a callable."""
    return _jax_export.deserialize(data).call


def save_exported(path: str, fn: Callable, *example_args, **kw) -> None:
    with open(path, "wb") as f:
        f.write(export_jit(fn, *example_args, **kw))


def load_exported_file(path: str) -> Callable:
    with open(path, "rb") as f:
        return load_exported(f.read())
