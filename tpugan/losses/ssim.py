"""SSIM (structural similarity) — jnp, NHWC.

Numerically matches the reference metric/pytorch_ssim.py:8-74: 11x11
Gaussian window (sigma 1.5), zero-padded depthwise convolutions, biased
(local-window) variances, C1 = 0.01^2, C2 = 0.03^2.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    g = np.array(
        [math.exp(-((x - window_size // 2) ** 2) / (2.0 * sigma**2)) for x in range(window_size)],
        dtype=np.float32,
    )
    g /= g.sum()
    return np.outer(g, g)


def _filter(x: jax.Array, window: jax.Array, pad: int) -> jax.Array:
    c = x.shape[-1]
    rhs = jnp.tile(window[:, :, None, None], (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x,
        rhs.astype(x.dtype),
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def ssim(
    img1: jax.Array,
    img2: jax.Array,
    window_size: int = 11,
    sigma: float = 1.5,
    size_average: bool = True,
) -> jax.Array:
    """Mean SSIM over NHWC batches (reference _ssim, pytorch_ssim.py:18-38)."""
    window = jnp.asarray(_gaussian_window(window_size, sigma))
    pad = window_size // 2

    mu1 = _filter(img1, window, pad)
    mu2 = _filter(img2, window, pad)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _filter(img1 * img1, window, pad) - mu1_sq
    sigma2_sq = _filter(img2 * img2, window, pad) - mu2_sq
    sigma12 = _filter(img1 * img2, window, pad) - mu1_mu2

    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    if size_average:
        return jnp.mean(ssim_map)
    return jnp.mean(ssim_map, axis=(1, 2, 3))
