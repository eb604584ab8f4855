"""Validation grids: G(z) vs G(E(G(z))) on held-out seeds.

Rebuild of synthesized_IMG.py:21-186 / synthesized_textBigGAN.py: training
used seeds 0..29999, validation uses seeds >= 30000 (:97-98); each seed
renders a side-by-side original/reconstruction grid saved as
``img*0.5+0.5`` (:145-146).
"""

from __future__ import annotations

import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from tpugan.io.image import save_image_grid, to_unit
from tpugan.utils import iteration_key


def synthesize_grids(
    synth: Callable[[jax.Array, jax.Array], tuple[jax.Array, jax.Array]],
    encode: Callable[[jax.Array], jax.Array],
    resynth: Callable[[jax.Array], jax.Array],
    out_dir: str,
    batch_size: int = 2,
    z_dim: int = 512,
    start_seed: int = 30000,
    count: int = 5,
):
    """For seeds start_seed..start_seed+count-1: z -> (w1, imgs1) via
    ``synth``; w2 = ``encode``(imgs1); imgs2 = ``resynth``(w2); save the
    original/reconstruction grid. Returns the list of file paths."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []

    @jax.jit
    def step(seed):
        key = iteration_key(seed)
        z = jax.random.normal(jax.random.fold_in(key, 0), (batch_size, z_dim))
        w1, imgs1 = synth(key, z)
        w2 = encode(imgs1)
        imgs2 = resynth(w2)
        return imgs1, imgs2

    for seed in range(start_seed, start_seed + count):
        imgs1, imgs2 = step(jnp.int32(seed))
        grid = np.concatenate([to_unit(imgs1), to_unit(imgs2)], axis=0)
        path = os.path.join(out_dir, f"seed{seed}.png")
        save_image_grid(path, np.clip(grid, 0, 1), nrow=batch_size)
        paths.append(path)
    return paths
