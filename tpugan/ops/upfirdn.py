"""upfirdn2d — upsample, FIR filter, downsample (NHWC).

This is the classic StyleGAN native op (the reference emulates it with
pad+grouped-conv in python: model/stylegan1/net.py:48-58 ``Blur`` and
model/stylegan2_generator.py:556-615 ``UpsamplingLayer``). Here it is one
primitive with two backends:

  * a jnp/XLA path built on ``lax.conv_general_dilated`` with lhs dilation
    (zero-stuffing), depthwise filtering and stride-downsampling — XLA maps
    this onto the TPU convolution units directly;
  * a Pallas kernel (tpugan/ops/pallas/upfirdn2d.py) for the hot separable
    cases, selected via ``use_pallas=True`` or the TPUGAN_PALLAS env var.

Convention: cross-correlation with the given kernel (all kernels used by the
model zoo are symmetric, so this matches the reference numerically).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np


def setup_fir_kernel(taps) -> jnp.ndarray:
    """Build a normalized 2-D FIR kernel from 1-D taps (outer product).

    e.g. (1, 2, 1) -> 3x3 binomial / 16 (the reference Blur,
    net.py:51-54); (1, 3, 3, 1) -> the StyleGAN2 resample kernel
    (stylegan2_generator.py:389, 566-571).
    """
    k = np.asarray(taps, dtype=np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    k = k / k.sum()
    return jnp.asarray(k)


def _use_pallas(explicit: bool | None) -> bool:
    if explicit is not None:
        return explicit
    if os.environ.get("TPUGAN_PALLAS", "").lower() in ("0", "false", "off"):
        return False
    # honor `with jax.default_device(...)` (e.g. CPU-side init/conversion)
    dd = jax.config.jax_default_device
    if dd is not None and getattr(dd, "platform", None) != "tpu":
        return False
    return jax.default_backend() == "tpu"


def upfirdn2d(
    x: jax.Array,
    kernel: jax.Array,
    up: int = 1,
    down: int = 1,
    pad: tuple[int, int] = (0, 0),
    gain: float = 1.0,
    use_pallas: bool | None = None,
) -> jax.Array:
    """Upsample by ``up`` (zero-stuffing), pad, FIR-filter, downsample by ``down``.

    x: [N, H, W, C]; kernel: [kh, kw] applied depthwise.
    pad = (pad0, pad1) applied before/after on both spatial dims.
    Output spatial size: (H*up + pad0 + pad1 - kh) // down + 1.
    Differentiable: the backward pass is itself an upfirdn2d with flipped
    taps and swapped up/down factors (custom VJP, so the Pallas forward is
    trainable).
    """
    return _upfirdn2d(x, kernel, up, down, tuple(pad), float(gain), _use_pallas(use_pallas))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _upfirdn2d(x, kernel, up, down, pad, gain, use_pallas):
    return _upfirdn2d_impl(x, kernel, up, down, pad, gain, use_pallas)


def _upfirdn2d_impl(x, kernel, up, down, pad, gain, use_pallas):
    # The Pallas kernel specialises on concrete taps; a traced kernel array
    # (e.g. passed as a jit argument) takes the XLA path. Measured on v5e:
    # pallas wins blur/down2 (1.9x) and, with the per-phase formulation,
    # up2 as well (1.5-1.9x).
    c = x.shape[-1]
    if (
        use_pallas
        and not isinstance(kernel, jax.core.Tracer)
        and min(pad) >= 0
        and kernel.shape[0] == kernel.shape[1] <= 8
    ):
        if (up, down) in ((1, 1), (1, 2), (2, 1)) and c % 128 == 0:
            from tpugan.ops.pallas.upfirdn2d import upfirdn2d_pallas

            out = upfirdn2d_pallas(x, kernel, up=up, down=down, pad=pad)
            return out * gain if gain != 1.0 else out
        if (up, down) == (1, 1) and 128 % c == 0:
            # small channel counts: flat (W, C) lane layout — the hot
            # E_Blur path at 1024^2 x 16 (XLA depthwise ~34 GB/s there)
            from tpugan.ops.pallas.upfirdn2d import upfirdn2d_pallas_small_c

            out = upfirdn2d_pallas_small_c(x, kernel, pad=pad)
            return out * gain if gain != 1.0 else out
    return _upfirdn2d_xla(x, kernel, up, down, pad, gain)


def _upfirdn2d_fwd(x, kernel, up, down, pad, gain, use_pallas):
    out = _upfirdn2d_impl(x, kernel, up, down, pad, gain, use_pallas)
    return out, (kernel, x.shape[1], x.shape[2], out.shape[1], out.shape[2])


def _upfirdn2d_bwd(up, down, pad, gain, use_pallas, res, g):
    kernel, h, w, gh, gw = res
    kh, kw = kernel.shape
    # adjoint: stuff grad by ``down``, correlate with flipped taps, decimate
    # by ``up``; pads chosen so the output size equals the input size exactly
    p0 = kh - 1 - pad[0]
    p1h = (h - 1) * up + 1 + pad[0] - gh * down
    p1w = (w - 1) * up + 1 + pad[0] - gw * down
    kflip = jnp.flip(kernel, axis=(0, 1))
    if p1h == p1w:
        dx = _upfirdn2d_impl(g, kflip, down, up, (p0, p1h), gain, use_pallas)
    else:  # non-square fallback: run XLA with per-dim pads
        c = g.shape[-1]
        rhs = jnp.tile((kflip * gain).astype(g.dtype)[:, :, None, None], (1, 1, 1, c))
        dx = jax.lax.conv_general_dilated(
            g,
            rhs,
            window_strides=(up, up),
            padding=((p0, p1h + down - 1), (p0, p1w + down - 1)),
            lhs_dilation=(down, down),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
            precision=jax.lax.Precision.HIGHEST,
        )
    return dx, jnp.zeros_like(kernel)


_upfirdn2d.defvjp(_upfirdn2d_fwd, _upfirdn2d_bwd)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _upfirdn2d_xla(x, kernel, up, down, pad, gain):
    c = x.shape[-1]
    kh, kw = kernel.shape
    k = (kernel * gain).astype(x.dtype)
    rhs = jnp.tile(k[:, :, None, None], (1, 1, 1, c))  # HWIO, I=1 (depthwise)
    # lhs_dilation yields (H-1)*up+1 samples; the stuffed signal is H*up,
    # so the trailing up-1 zeros fold into the high padding.
    pad_eff = (pad[0], pad[1] + up - 1)
    return jax.lax.conv_general_dilated(
        x,
        rhs,
        window_strides=(down, down),
        padding=(pad_eff, pad_eff),
        lhs_dilation=(up, up),
        rhs_dilation=(1, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )


def blur3x3(x: jax.Array, use_pallas: bool | None = None) -> jax.Array:
    """Depthwise (1,2,1) binomial blur, same-size (reference Blur, net.py:48-58)."""
    return upfirdn2d(x, setup_fir_kernel((1.0, 2.0, 1.0)), pad=(1, 1), use_pallas=use_pallas)


def upsample_fir(x: jax.Array, kernel: jax.Array, factor: int = 2, use_pallas=None) -> jax.Array:
    """Zero-stuff x2 then FIR, gain=factor^2 (SG2 UpsamplingLayer semantics,
    stylegan2_generator.py:573-615)."""
    kh = kernel.shape[0]
    p = kh - factor
    pad0 = (p + 1) // 2 + factor - 1
    pad1 = p // 2
    return upfirdn2d(
        x, kernel, up=factor, pad=(pad0, pad1), gain=float(factor**2), use_pallas=use_pallas
    )


def downsample_fir(x: jax.Array, kernel: jax.Array, factor: int = 2, use_pallas=None) -> jax.Array:
    """FIR then stride-``factor`` decimation."""
    kh = kernel.shape[0]
    p = kh - factor
    pad0 = (p + 1) // 2
    pad1 = p // 2
    return upfirdn2d(x, kernel, down=factor, pad=(pad0, pad1), use_pallas=use_pallas)
