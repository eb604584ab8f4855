"""Space-to-depth convolution — filling the TPU lane axis at the top of
the pyramid.

Why: the SG2-1024 / E_Blur top layers convolve 1024²/512² activations
with 16/32 channels. On TPU the minor-most (channel) axis maps to the
128-wide vector lane / MXU column dimension, so a 16-channel conv fills
at most 1/8 of every lane-tile it touches — the measured b8 op profile
is a flat tail of such movement-dominated conv fusions with MXU ≤ 0.3 %
each (BASELINE.md, round-5 occupancy experiments). Space-to-depth (the
MLPerf-ResNet "conv-S2D" trick, applied here to stride-1 stylegan convs)
re-expresses the SAME convolution on a (H/2, W/2, 4C) tensor whose
channel axis is 4× fuller, trading zero-padded lanes for real data.

The transform is EXACT (not an approximation): for a stride-1 "same"
k×k conv (odd k),

    y[2i+oy, 2j+ox, k] = Σ_{ky,kx,c} w[ky,kx,c,k] · x[2i+oy+ky-p, 2j+ox+kx-p, c]

and writing u = oy+ky-p = 2·di + ry (ry ∈ {0,1}) turns the sum into a
⌈(k+1)/2⌉-tap conv over the S2D tensor x'[i,j,(ry,rx,c)] with an
expanded kernel W'[di,dj,(ry,rx,c),(oy,ox,k)] that is w re-indexed with
zeros where no (ky,kx) maps — adding structural zeros, so every output
element is the same fp dot product with extra +0 terms. The reference's
torch modules have no counterpart (CUDA cores don't pad lanes); this is
a TPU-layout rewrite of model/stylegan2_generator.py:742-922's stride-1
conv and model/E/E_Blur.py's top convs.

FLOP accounting: the dense expanded conv computes 4× the MACs (most
multiply structural zeros), but the replaced convs run at ≤0.3 % MXU —
the point is fewer, fatter, better-tiled ops, not FLOP savings.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "space_to_depth",
    "depth_to_space",
    "expand_kernel_s2d",
    "expand_kernel_s2d_stride",
    "conv_s2d",
    "conv_s2d_stride2",
    "blur3x3_s2d",
    "use_s2d",
]


def use_s2d(h: int, w: int, c: int, explicit: bool | None = None) -> bool:
    """Dispatch policy for the S2D conv path: OPT-IN (TPUGAN_S2D=1).

    Like the Pallas FIR kernels (ops/upfirdn.py::_use_pallas), this stays
    off until measured end-to-end in context — standalone wins have
    inverted in-context twice in this repo's history. When enabled, only
    convs whose channel axis underfills the 128-lane tile on large
    spatial extents dispatch (thresholds env-overridable for tests and
    experiments: TPUGAN_S2D_MIN_H, default 512; TPUGAN_S2D_MAX_C, 32).
    """
    if explicit is not None:
        return explicit
    if os.environ.get("TPUGAN_S2D", "").lower() not in ("1", "true", "on"):
        return False
    min_h = int(os.environ.get("TPUGAN_S2D_MIN_H", "512"))
    max_c = int(os.environ.get("TPUGAN_S2D_MAX_C", "32"))
    return h >= min_h and w >= min_h and h % 2 == 0 and w % 2 == 0 and c <= max_c


def space_to_depth(x: jax.Array, b: int = 2) -> jax.Array:
    """(N, H, W, C) -> (N, H/b, W/b, b*b*C); channel order (ry, rx, c)."""
    n, h, w, c = x.shape
    assert h % b == 0 and w % b == 0, (h, w, b)
    x = x.reshape(n, h // b, b, w // b, b, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // b, w // b, b * b * c)


def depth_to_space(y: jax.Array, b: int = 2) -> jax.Array:
    """Inverse of :func:`space_to_depth`."""
    n, h, w, cc = y.shape
    c = cc // (b * b)
    y = y.reshape(n, h, w, b, b, c)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(n, h * b, w * b, c)


def _s2d_index_maps(k: int, b: int = 2):
    """Static index/mask arrays for the kernel expansion (numpy, traced-free).

    Returns (di_lo, kk, ky_idx, mask) where ky_idx[di, r, o] is the source
    tap (clipped into range) and mask[di, r, o] its validity, for
    u = o + ky - pad = b*di + r.
    """
    assert k % 2 == 1, "odd kernels only"
    pad = k // 2
    u_lo, u_hi = -pad, (b - 1) + (k - 1) - pad
    di_lo = u_lo // b if u_lo >= 0 else -((-u_lo + b - 1) // b)
    di_hi = u_hi // b
    kk = di_hi - di_lo + 1
    ky = np.zeros((kk, b, b), np.int32)
    mask = np.zeros((kk, b, b), bool)
    for t in range(kk):
        di = di_lo + t
        for r in range(b):
            for o in range(b):
                tap = b * di + r - o + pad
                if 0 <= tap < k:
                    ky[t, r, o] = tap
                    mask[t, r, o] = True
    return di_lo, kk, ky, mask


def expand_kernel_s2d(w: jax.Array, b: int = 2):
    """(k, k, C, K) -> (kk, kk, b²C, b²K) expanded kernel + S2D padding.

    Returns (w_s2d, (pad_lo, pad_hi)) such that a stride-1 conv of the S2D
    tensor with ``w_s2d`` under that padding equals the original "same"
    conv (see module docstring for the exactness argument).
    """
    k = w.shape[0]
    c, kout = w.shape[2], w.shape[3]
    di_lo, kk, ky, mask = _s2d_index_maps(k, b)
    # gather: out[di, dj, ry, rx, oy, ox, c, k] = w[ky(di,ry,oy), kx(dj,rx,ox)]
    ky_b = ky[:, None, :, None, :, None]          # (kk,1,b,1,b,1)
    kx_b = ky[None, :, None, :, None, :]          # (1,kk,1,b,1,b)
    m = (mask[:, None, :, None, :, None] & mask[None, :, None, :, None, :])
    gathered = w[ky_b, kx_b]                      # (kk,kk,b,b,b,b,C,K)
    gathered = jnp.where(m[..., None, None], gathered, jnp.zeros((), w.dtype))
    # -> (di, dj, ry, rx, c, oy, ox, k) -> (kk, kk, b²C, b²K)
    gathered = gathered.transpose(0, 1, 2, 3, 6, 4, 5, 7)
    w_s2d = gathered.reshape(kk, kk, b * b * c, b * b * kout)
    return w_s2d, (-di_lo, kk - 1 + di_lo)


def _stride2_index_maps(k: int, pad: int, b: int = 2):
    """Index/mask arrays for the STRIDED (block-consuming) expansion.

    A stride-b conv has no output phase: y[i] reads x[b·i + ky - pad], so
    ky - pad = b·di + ry maps each tap to one (block offset, in-phase).
    """
    u_lo, u_hi = -pad, (k - 1) - pad
    di_lo = u_lo // b if u_lo >= 0 else -((-u_lo + b - 1) // b)
    di_hi = u_hi // b
    kk = di_hi - di_lo + 1
    ky = np.zeros((kk, b), np.int32)
    mask = np.zeros((kk, b), bool)
    for t in range(kk):
        for r in range(b):
            tap = b * (di_lo + t) + r + pad
            if 0 <= tap < k:
                ky[t, r] = tap
                mask[t, r] = True
    return di_lo, kk, ky, mask


def expand_kernel_s2d_stride(w: jax.Array, pad: int, b: int = 2):
    """(k, k, C, K) stride-b kernel -> (kk, kk, b²C, K) block-grid kernel.

    The output lives on the block grid directly (a stride-b conv already
    produces H/b outputs), so only the INPUT gets phase-expanded. Covers
    the E_Blur fused-scale convs (4×4 stride-2 after transform_kernel,
    pad 1: lreq.py:129-131) exactly.
    """
    c, kout = w.shape[2], w.shape[3]
    di_lo, kk, ky, mask = _stride2_index_maps(w.shape[0], pad, b)
    ky_b = ky[:, None, :, None]                   # (kk,1,b,1)
    kx_b = ky[None, :, None, :]                   # (1,kk,1,b)
    m = mask[:, None, :, None] & mask[None, :, None, :]
    gathered = w[ky_b, kx_b]                      # (kk,kk,b,b,C,K)
    gathered = jnp.where(m[..., None, None], gathered, jnp.zeros((), w.dtype))
    w_blk = gathered.reshape(kk, kk, b * b * c, kout)
    return w_blk, (-di_lo, kk - 1 + di_lo)


def conv_s2d_stride2(
    x: jax.Array,
    w: jax.Array,
    pad: int,
    b: int = 2,
    in_s2d: bool = False,
) -> jax.Array:
    """Stride-2 NHWC conv consuming a space-to-depth input.

    Equals ``conv(x, w, stride=2, padding=pad)`` for inputs whose spatial
    extent is a multiple of 2 and whose output size is H/2 (the
    fused-scale downsamplers in this zoo). Output is a NORMAL tensor at
    the block-grid resolution — a stride-2 conv is the natural S2D-domain
    EXIT, so chains pay no depth-to-space at the bottom.
    """
    if not in_s2d:
        x = space_to_depth(x, b)
    w_blk, (plo, phi) = expand_kernel_s2d_stride(w, pad, b)
    return jax.lax.conv_general_dilated(
        x,
        w_blk,
        window_strides=(1, 1),
        padding=((plo, phi), (plo, phi)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def blur3x3_s2d(x_s2d: jax.Array, fir: np.ndarray, b: int = 2) -> jax.Array:
    """Depthwise 3×3 FIR applied IN the S2D domain.

    The depthwise filter is lifted to a dense (3,3,C,C) kernel with the
    FIR on the diagonal, then phase-expanded like any conv — structural
    zeros only, so the result is the exact depthwise blur. At C=16/32 the
    dense form is ≤64×64 per tap: trivial MXU work in exchange for
    staying in the lane-filled domain.
    """
    cc = x_s2d.shape[-1]
    c = cc // (b * b)
    eye = np.eye(c, dtype=np.float32)
    dense = jnp.asarray(fir[:, :, None, None] * eye[None, None], x_s2d.dtype)
    return conv_s2d(x_s2d, dense, b=b, in_s2d=True, out_s2d=True)


def s2d_instance_moments(x_s2d: jax.Array, b: int = 2):
    """Per-sample, per-ORIGINAL-channel spatial mean/std in S2D domain.

    Same statistics as ops/basic.py::instance_moments on the
    depth-to-space tensor (the b² phase channels of each original channel
    are part of its spatial extent); fp32 accumulation like the original.
    """
    n, h, w, cc = x_s2d.shape
    c = cc // (b * b)
    x32 = x_s2d.astype(jnp.float32).reshape(n, h, w, b * b, c)
    mean = jnp.mean(x32, axis=(1, 2, 3))
    var = jnp.mean(
        jnp.square(x32 - mean[:, None, None, None, :]), axis=(1, 2, 3)
    )
    return mean.astype(x_s2d.dtype), jnp.sqrt(var).astype(x_s2d.dtype)


def s2d_instance_norm(x_s2d: jax.Array, b: int = 2, epsilon: float = 1e-8):
    """ops/basic.py::instance_norm computed in S2D domain."""
    n, h, w, cc = x_s2d.shape
    c = cc // (b * b)
    x32 = x_s2d.astype(jnp.float32).reshape(n, h, w, b * b, c)
    mean = jnp.mean(x32, axis=(1, 2, 3), keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2, 3), keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + epsilon)
    return y.reshape(n, h, w, cc).astype(x_s2d.dtype)


def s2d_phase_mean(x_s2d: jax.Array, b: int = 2) -> jax.Array:
    """2×2 average-pool via the phase axis: == ops/basic.py::downscale2d
    of the depth-to-space tensor (each block's b² pixels ARE its phases).
    Output is a NORMAL tensor at the block-grid resolution."""
    n, h, w, cc = x_s2d.shape
    c = cc // (b * b)
    return jnp.mean(x_s2d.reshape(n, h, w, b * b, c), axis=3)


def s2d_tile_channel(v: jax.Array, b: int = 2) -> jax.Array:
    """Broadcast a per-original-channel vector over the phase channels
    ((ry, rx, c) channel order: phases major, c minor)."""
    return jnp.tile(v, b * b)


def conv_s2d(
    x: jax.Array,
    w: jax.Array,
    b: int = 2,
    in_s2d: bool = False,
    out_s2d: bool = False,
) -> jax.Array:
    """Stride-1 "same" NHWC conv computed in space-to-depth domain.

    ``in_s2d``/``out_s2d`` keep the input/output in the (H/b, W/b, b²C)
    domain so chains of top-of-pyramid layers pay the reshape only at the
    domain boundary.
    """
    if not in_s2d:
        x = space_to_depth(x, b)
    w_s2d, (plo, phi) = expand_kernel_s2d(w, b)
    y = jax.lax.conv_general_dilated(
        x,
        w_s2d,
        window_strides=(1, 1),
        padding=((plo, phi), (plo, phi)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if not out_s2d:
        y = depth_to_space(y, b)
    return y
