"""Elementwise / normalization primitives (NHWC).

TPU-native rebuild of the reference's L2 helpers
(``/root/reference/model/stylegan1/net.py:28-69`` — pixel_norm, style_mod,
upscale2d/downscale2d, minibatch_stddev; ``model/E/E.py:51-66`` — per-channel
moment statistics). All functions are pure, jit-friendly, and operate on
NHWC tensors; XLA fuses these into neighbouring convs so no Pallas kernel is
needed for them individually (the fused noise+bias+lrelu chain does get one,
see tpugan/ops/pallas/fused_act.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pixel_norm(x: jax.Array, axis: int = -1, epsilon: float = 1e-8) -> jax.Array:
    """x * rsqrt(mean(x^2) + eps) over the channel axis.

    Reference: model/stylegan1/net.py:28-29 (channel dim 1 in NCHW; here the
    channel axis is last). Moments accumulate in fp32 regardless of input
    dtype (bf16-safe: mean of squares underflows/rounds badly in bf16).
    """
    x32 = x.astype(jnp.float32)
    r = jax.lax.rsqrt(jnp.mean(jnp.square(x32), axis=axis, keepdims=True) + epsilon)
    return x * r.astype(x.dtype)


def style_mod(x: jax.Array, style: jax.Array) -> jax.Array:
    """AdaIN affine: ``bias + x * (scale + 1)``.

    ``style`` is [N, 2*C]: first C entries are the scale, last C the bias —
    matching the reference's [n, 2, C, 1, 1] reshape where style[:,0] is the
    scale and style[:,1] the bias (model/stylegan1/net.py:32-34).

    x: [N, H, W, C].
    """
    n = x.shape[0]
    c = x.shape[-1]
    s = style.reshape(n, 2, c)
    scale = s[:, 0][:, None, None, :]
    bias = s[:, 1][:, None, None, :]
    return bias + x * (scale + 1.0)


def upscale2d(x: jax.Array, factor: int = 2) -> jax.Array:
    """Nearest-neighbour 2x upsample, NHWC (reference net.py:37-43)."""
    if factor == 1:
        return x
    n, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (n, h, factor, w, factor, c))
    return x.reshape(n, h * factor, w * factor, c)


def downscale2d(x: jax.Array, factor: int = 2) -> jax.Array:
    """Average-pool downsample, NHWC (reference net.py:45-46)."""
    if factor == 1:
        return x
    return jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        window_dimensions=(1, factor, factor, 1),
        window_strides=(1, factor, factor, 1),
        padding="VALID",
    ) / float(factor * factor)


def instance_moments(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-sample, per-channel spatial mean and (biased) std.

    Used both for instance norm and for the encoder's style statistics
    (model/E/E.py:51-53). x: [N, H, W, C] -> ([N, C], [N, C]).
    """
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2))
    var = jnp.mean(jnp.square(x32 - mean[:, None, None, :]), axis=(1, 2))
    std = jnp.sqrt(var)
    return mean.astype(x.dtype), std.astype(x.dtype)


def instance_norm(x: jax.Array, epsilon: float = 1e-8) -> jax.Array:
    """InstanceNorm2d(affine=False), biased variance, NHWC.

    Matches torch.nn.InstanceNorm2d(eps=1e-8) as used throughout the
    reference (model/stylegan1/net.py:127,134; model/E/E.py:23,30).
    """
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2), keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + epsilon)).astype(x.dtype)


def minibatch_stddev(x: jax.Array, group_size: int = 4) -> jax.Array:
    """Append a cross-sample stddev feature channel (discriminators only).

    Reference: model/stylegan1/net.py:60-69. x: [N, H, W, C] -> [N, H, W, C+1].
    Requires N % group to be 0 or pads by wrapping like the reference.
    """
    n, h, w, c = x.shape
    g = min(group_size, n)
    pad = (g - n % g) % g
    y = jnp.concatenate([x, x[:pad]], axis=0) if pad else x
    y = y.reshape(g, -1, h, w, c)
    y = y - jnp.mean(y, axis=0, keepdims=True)
    y = jnp.sqrt(jnp.mean(jnp.square(y), axis=0) + 1e-8)
    y = jnp.mean(y, axis=(1, 2, 3), keepdims=True)  # [n//g, 1, 1, 1]
    y = jnp.tile(y, (g, h, w, 1))[:n]
    return jnp.concatenate([x, y], axis=-1)


def leaky_relu(x: jax.Array, negative_slope: float = 0.2) -> jax.Array:
    return jnp.where(x >= 0, x, x * negative_slope)


def noise_inject(
    x: jax.Array,
    noise_weight: jax.Array,
    key: jax.Array | None,
    noise: jax.Array | None = None,
) -> jax.Array:
    """x + noise_weight * noise with single-channel spatial noise.

    Reference: ``torch.addcmul(x, 1.0, noise_weight, randn([n,1,h,w]))``
    (model/stylegan1/net.py:148, model/E/E.py:60). noise_weight is [C]
    (broadcast over space); noise is [N, H, W, 1] or drawn from ``key``.
    Passing ``noise`` explicitly is the parity-test hook; passing
    ``key=None, noise=None`` disables injection (deterministic eval).
    """
    if noise is None:
        if key is None:
            return x
        n, h, w, _ = x.shape
        noise = jax.random.normal(key, (n, h, w, 1), dtype=x.dtype)
    return x + noise_weight * noise
