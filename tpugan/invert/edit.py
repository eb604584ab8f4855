"""Latent editing with InterfaceGAN boundary directions.

Rebuild of embeded_img_edit.py: load an inverted w code [1, L, 512] and a
direction .npy [1, 512], add ``bonus * direction`` on a layer slice, and
regenerate (embeded_img_edit.py:26-42). The reference ships five
directions (latent_code/directions/*.npy: age, gender, eyeglasses, pose,
smile) — any [1, 512] or [512] npy works here.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def load_direction(path) -> jnp.ndarray:
    """direction .npy -> [512] float32."""
    d = np.load(path)
    return jnp.asarray(d.reshape(-1), dtype=jnp.float32)


def edit_latent(
    w: jnp.ndarray,
    direction: jnp.ndarray,
    bonus: float = 3.0,
    start: int = 0,
    end: int = 18,
) -> jnp.ndarray:
    """w [N, L, latent] -> edited copy.

    Matches ``w[start:start+end] = (w + bonus*direction)[start:start+end]``
    (embeded_img_edit.py:35-38, applied per-sample over the layer axis).
    """
    num_layers = w.shape[1]
    edited = w + bonus * direction[None, None, :]
    idx = jnp.arange(num_layers)[None, :, None]
    mask = (idx >= start) & (idx < start + end)
    return jnp.where(mask, edited, w)
