"""SSIM (structural similarity) — jnp, NHWC.

Numerically matches the reference metric/pytorch_ssim.py:8-74: 11x11
Gaussian window (sigma 1.5), zero-padded depthwise convolutions, biased
(local-window) variances, C1 = 0.01^2, C2 = 0.03^2.

TPU-first formulation: the Gaussian window is an outer product, so the five
2-D filters the reference runs (mu1, mu2, E[x^2], E[y^2], E[xy]) collapse to
ONE separable two-pass blur over a channel-stacked tensor — 2 depthwise
convs of K taps instead of 5 convs of K^2 taps (~12x fewer FLOPs at K=11),
mathematically identical under zero padding.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def _gaussian_1d(window_size: int, sigma: float) -> np.ndarray:
    # numpy, not jnp: this is lru_cached at module level and jnp values
    # created inside a trace become Tracers (jax 0.9)
    g = np.array(
        [math.exp(-((x - window_size // 2) ** 2) / (2.0 * sigma**2)) for x in range(window_size)],
        dtype=np.float32,
    )
    g /= g.sum()
    return g


@functools.lru_cache(maxsize=8)
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    g = _gaussian_1d(window_size, sigma)
    return np.outer(g, g)


def _blur_separable(x: jax.Array, g1d: np.ndarray, pad: int) -> jax.Array:
    """Two-pass depthwise Gaussian blur, zero padded (== the 2-D conv)."""
    c = x.shape[-1]
    k = jnp.asarray(g1d, dtype=x.dtype)
    kv = jnp.tile(k[:, None, None, None], (1, 1, 1, c))  # (K,1,1,C) HWIO
    kh = jnp.tile(k[None, :, None, None], (1, 1, 1, c))  # (1,K,1,C)
    x = jax.lax.conv_general_dilated(
        x, kv, window_strides=(1, 1), padding=((pad, pad), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )
    return jax.lax.conv_general_dilated(
        x, kh, window_strides=(1, 1), padding=((0, 0), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )


def ssim(
    img1: jax.Array,
    img2: jax.Array,
    window_size: int = 11,
    sigma: float = 1.5,
    size_average: bool = True,
) -> jax.Array:
    """Mean SSIM over NHWC batches (reference _ssim, pytorch_ssim.py:18-38)."""
    g1d = _gaussian_1d(window_size, sigma)
    pad = window_size // 2
    c = img1.shape[-1]

    stacked = jnp.concatenate(
        [img1, img2, img1 * img1, img2 * img2, img1 * img2], axis=-1
    )
    blurred = _blur_separable(stacked, g1d, pad)
    mu1, mu2, e_x2, e_y2, e_xy = (
        blurred[..., i * c : (i + 1) * c] for i in range(5)
    )
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = e_x2 - mu1_sq
    sigma2_sq = e_y2 - mu2_sq
    sigma12 = e_xy - mu1_mu2

    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    if size_average:
        return jnp.mean(ssim_map)
    return jnp.mean(ssim_map, axis=(1, 2, 3))
