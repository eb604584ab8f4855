"""Paired-image evaluation metrics: PSNR / SSIM / MSE / LPIPS / cosine.

Native rebuild of comparing-baseline.py:17-44 (which uses skimage +
torch + lpips). Semantics preserved:
  * PSNR over range-255 images: 10*log10(R^2 / mse)
  * SSIM with skimage defaults: 7x7 uniform filter, sample-covariance
    normalisation (N/(N-1)), K1=0.01, K2=0.03, channels averaged
  * MSE over range-255 tensors
  * LPIPS and cosine over [-1, 1] scalings (:29-31)

Identity fixpoint (same image twice): psnr inf (or ~88.13 with eps noise),
ssim 1.0, lpips 0, mse 0, cosine 1.0 (comparing-baseline.py:88).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class PairMetrics(NamedTuple):
    psnr: jax.Array
    ssim: jax.Array
    lpips: jax.Array
    mse: jax.Array
    cosine: jax.Array


def psnr(a: jax.Array, b: jax.Array, data_range: float = 255.0) -> jax.Array:
    """a, b: [H, W, C] (range-255 like the reference)."""
    mse = jnp.mean(jnp.square(a - b))
    return 10.0 * jnp.log10(data_range**2 / mse)


def _uniform_filter(x: jax.Array, size: int) -> jax.Array:
    """scipy.ndimage.uniform_filter with 'reflect' boundary, per channel.

    x: [H, W, C]."""
    pad = size // 2
    # reflect mode: edge value not repeated (scipy default 'reflect' ==
    # np.pad 'symmetric'); scipy 'reflect' == np.pad mode 'symmetric'? No:
    # scipy uniform_filter default mode='reflect' mirrors including the edge
    # sample (d c b a | a b c d), which equals np.pad 'symmetric'.
    xp = jnp.pad(x, ((pad, pad - (1 - size % 2)), (pad, pad - (1 - size % 2)), (0, 0)), mode="symmetric")
    c = x.shape[-1]
    k = jnp.ones((size, size, 1, 1), x.dtype) / (size * size)
    rhs = jnp.tile(k, (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        xp[None],
        rhs,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )[0]


def ssim_uniform(
    a: jax.Array, b: jax.Array, data_range: float = 255.0, win_size: int = 7
) -> jax.Array:
    """skimage structural_similarity defaults (no gaussian weights).

    a, b: [H, W, C]; channels processed independently then averaged
    (multichannel=True)."""
    np_ = win_size * win_size
    cov_norm = np_ / (np_ - 1.0)  # sample covariance (skimage)
    ux = _uniform_filter(a, win_size)
    uy = _uniform_filter(b, win_size)
    uxx = _uniform_filter(a * a, win_size)
    uyy = _uniform_filter(b * b, win_size)
    uxy = _uniform_filter(a * b, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    a1 = 2 * ux * uy + c1
    a2 = 2 * vxy + c2
    b1 = ux * ux + uy * uy + c1
    b2 = vx + vy + c2
    s = (a1 * a2) / (b1 * b2)
    # skimage crops win_size//2 border before averaging
    pad = (win_size - 1) // 2
    s = s[pad : s.shape[0] - pad, pad : s.shape[1] - pad]
    return jnp.mean(s)


def pair_metrics(
    a: jax.Array,
    b: jax.Array,
    lpips_fn: Optional[Callable] = None,
) -> PairMetrics:
    """Metrics for one image pair; a, b: [H, W, C] in [0, 1]."""
    a255, b255 = a * 255.0, b * 255.0
    am, bm = a * 2.0 - 1.0, b * 2.0 - 1.0
    p = psnr(a255, b255)
    s = ssim_uniform(a255, b255)
    m = jnp.mean(jnp.square(a255 - b255))
    if lpips_fn is not None:
        l = jnp.mean(lpips_fn(am[None], bm[None]))
    else:
        l = jnp.float32(0.0)
    af, bf = am.reshape(-1), bm.reshape(-1)
    cos = jnp.dot(af, bf) / (jnp.sqrt(jnp.dot(af, af)) * jnp.sqrt(jnp.dot(bf, bf)))
    return PairMetrics(psnr=p, ssim=s, lpips=l, mse=m, cosine=cos)
