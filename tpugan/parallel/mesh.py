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


def auto_mesh(
    batch_size: int,
    space: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Optional[Mesh]:
    """Largest mesh the workload can actually fill, or None.

    The train/inversion steps pin the batch dim to the ``data`` axis,
    which requires ``batch_size % data_axis == 0`` — and the reference
    defaults (batch 1 inversion, batch 5 mis-align, batch 2 training)
    do not divide typical 2/4/8-device hosts. Rather than crash at the
    first sharding constraint, pick the data axis as the LARGEST divisor
    of ``batch_size`` that fits the devices left after the ``space``
    axis, and build the mesh on a device subset (legal in JAX; the rest
    idle). Returns None when that degenerates to a single device —
    plain jit beats a trivial 1x1 mesh there.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if space > n:
        raise ValueError(f"space={space} exceeds {n} available devices")
    data_room = n // space
    data = max(d for d in range(1, min(batch_size, data_room) + 1)
               if batch_size % d == 0)
    used = data * space
    if used == 1:
        return None
    if used < n:
        print(f"note: mesh uses {used} of {n} devices "
              f"(data={data} x space={space}; batch {batch_size} "
              f"constrains the data axis to its largest divisor)")
    return make_mesh(devices[:used], space=space)


def shard_batch(mesh: Mesh, spatial: bool = False) -> NamedSharding:
    """Sharding for [N, H, W, C] (or [N, ...]) batches: N over data,
    optionally H over space."""
    if spatial:
        return NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS))
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
