"""Device mesh + sharding policy.

The reference is strictly single-GPU (SURVEY.md §2.6: no torch.distributed
anywhere; the sole vestige is the commented-out cross-replica w_avg
all_gather in stylegan2_generator.py:18,178). The TPU-native design makes
parallelism first-class:

  * ``data`` axis — batch sharding (z, images); gradients are combined by
    XLA automatically because parameters are replicated and the loss is a
    mean over the batch (jit + NamedSharding inserts the psum).
  * ``space`` axis — optional sharding of the image H dimension for the
    1024x1024 pixel-gradient-heavy case-2 path; XLA inserts halo exchanges
    for the convolutions over ICI.

Everything rides jax.sharding / jit; there is no per-device code.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None, space: int = 1
) -> Mesh:
    """1-D data mesh, or 2-D (data, space) when ``space > 1``."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % space == 0, f"{n} devices not divisible by space={space}"
    arr = np.asarray(devices).reshape(n // space, space)
    return Mesh(arr, (DATA_AXIS, SPACE_AXIS))


def shard_batch(mesh: Mesh, spatial: bool = False) -> NamedSharding:
    """Sharding for [N, H, W, C] (or [N, ...]) batches: N over data,
    optionally H over space."""
    if spatial:
        return NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS))
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
