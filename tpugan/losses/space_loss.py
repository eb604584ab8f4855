"""The multi-term "space loss" on images or latents.

Faithful port of the reference ``space_loss`` (training_utils.py:54-99):

  total = 5*MSE + 3*cosine + (1 - SSIM) + 2*LPIPS        (image space)
  total = 5*MSE + 3*cosine                               (latent space)

with the same quirks preserved: the mean/std MSEs and the KL divergence are
computed and *logged but excluded* from the total (training_utils.py:66,97);
KL is nan/inf-guarded; the cosine distance flattens the whole batch into a
single vector; images are average-pooled to <= 256 px before SSIM/LPIPS
(training_utils.py:81-84).

Everything is a pure jittable function; ``info`` comes back as a NamedTuple
of scalars so callers can log at whatever cadence they like without
per-iteration host syncs (the reference's .item() calls were a throughput
bug we deliberately do not replicate).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from tpugan.losses.ssim import ssim as ssim_fn
from tpugan.ops.basic import downscale2d


class SpaceLossInfo(NamedTuple):
    mse: jax.Array
    mse_mean: jax.Array
    mse_std: jax.Array
    kl: jax.Array
    cosine: jax.Array
    ssim: jax.Array
    lpips: jax.Array


def zero_space_info() -> SpaceLossInfo:
    """Placeholder info for loss groups a step skips (lean off-tick steps,
    mis-align without guided-backprop)."""
    z = jnp.float32(0.0)
    return SpaceLossInfo(mse=z, mse_mean=z, mse_std=z, kl=z, cosine=z, ssim=z, lpips=z)


def _unbiased_std(x: jax.Array) -> jax.Array:
    n = x.size
    mean = jnp.mean(x)
    return jnp.sqrt(jnp.sum(jnp.square(x - mean)) / jnp.maximum(n - 1, 1))


def _kl_quirk(a: jax.Array, b: jax.Array) -> jax.Array:
    """KLDivLoss with torch's implicit-softmax-dim quirk (logged only).

    torch's legacy ``_get_softmax_dim`` picks dim 0 only for ndim 0/1/3 and
    dim 1 otherwise (training_utils.py:68-71): 4-D images -> channels
    (NHWC axis -1 here), 3-D w-latents [N,18,512] -> dim 0, and 2-D
    latents [N,C] (BigGAN cond-vector/const losses) -> dim 1.
    """
    axis = 0 if a.ndim in (0, 1, 3) else -1
    pa = jax.nn.softmax(a, axis=axis)
    pb = jax.nn.softmax(b, axis=axis)
    kl = jnp.mean(pa * (jnp.log(pa) - jnp.log(pb)))
    kl = jnp.where(jnp.isnan(kl), 0.0, kl)
    kl = jnp.where(jnp.isinf(kl), 1.0, kl)
    return kl


def pool_for_lpips(a: jax.Array) -> jax.Array:
    """The <=256px average-pool ladder applied before SSIM/LPIPS
    (training_utils.py:81-84) — exposed so callers caching a fixed
    target's LPIPS features (``lpips_fn.features``) pool it identically."""
    while a.shape[1] > 256:
        a = downscale2d(a)
    return a


def space_loss(
    a: jax.Array,
    b: jax.Array,
    image_space: bool = True,
    lpips_fn: Optional[Callable[[jax.Array, jax.Array], jax.Array]] = None,
    lpips_a_feats=None,
) -> tuple[jax.Array, SpaceLossInfo]:
    """Multi-term distance between ``a`` (target) and ``b`` (reconstruction).

    Image tensors are NHWC in [-1, 1]; latents may be any shape.
    ``lpips_fn(a, b) -> [N]`` is the perceptual distance (see
    tpugan.losses.lpips); None contributes 0 like the reference's
    ``image_space=False`` branch. ``lpips_a_feats`` are precomputed
    features of ``pool_for_lpips(a)`` (from ``lpips_fn.features``) for
    loops whose a-side is fixed — same value, half the VGG passes.
    """
    mse = jnp.mean(jnp.square(a - b))
    mse_mean = jnp.square(jnp.mean(a) - jnp.mean(b))
    mse_std = jnp.square(_unbiased_std(a) - _unbiased_std(b))
    kl = _kl_quirk(a, b)

    af, bf = a.reshape(-1), b.reshape(-1)
    # epsilon INSIDE the sqrt: clamping only the product would leave
    # d||x||/dx = x/||x|| = 0/0 -> NaN gradients on an exactly-zero input
    # (a randomly initialised G emits exactly 0 at w=0 because noise weights
    # and biases start at 0); 1e-12 is below fp32 resolution for any real
    # image/latent norm, so trained-model values are bit-identical
    denom = jnp.sqrt(jnp.dot(af, af) + 1e-12) * jnp.sqrt(jnp.dot(bf, bf) + 1e-12)
    cosine = 1.0 - jnp.dot(af, bf) / denom

    if image_space:
        while a.shape[1] > 256:
            a = downscale2d(a)
            b = downscale2d(b)
        ssim_val = ssim_fn(a, b)
        ssim_loss = 1.0 - ssim_val
        if lpips_fn is None:
            lpips_val = jnp.float32(0.0)
        elif lpips_a_feats is not None:
            lpips_val = jnp.mean(lpips_fn(a, b, a_feats=lpips_a_feats))
        else:
            lpips_val = jnp.mean(lpips_fn(a, b))
    else:
        ssim_loss = jnp.float32(0.0)
        lpips_val = jnp.float32(0.0)

    total = 5.0 * mse + 3.0 * cosine + ssim_loss + 2.0 * lpips_val
    info = SpaceLossInfo(
        mse=mse, mse_mean=mse_mean, mse_std=mse_std, kl=kl,
        cosine=cosine, ssim=ssim_loss, lpips=lpips_val,
    )
    return total, info
