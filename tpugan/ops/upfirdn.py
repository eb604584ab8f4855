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


def setup_fir_kernel(taps) -> np.ndarray:
    """Build a normalized 2-D FIR kernel from 1-D taps (outer product).

    e.g. (1, 2, 1) -> 3x3 binomial / 16 (the reference Blur,
    net.py:51-54); (1, 3, 3, 1) -> the StyleGAN2 resample kernel
    (stylegan2_generator.py:389, 566-571).

    Returns NUMPY: jax 0.9 turns jnp constants created inside a trace into
    Tracers, which would silently disable the concrete-taps Pallas dispatch.
    """
    k = np.asarray(taps, dtype=np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    return k / k.sum()


def _use_pallas(explicit: bool | None) -> bool:
    """Pallas FIR dispatch policy: OPT-IN (TPUGAN_PALLAS=1).

    Measured end-to-end on v5e: the standalone Pallas kernels beat XLA's
    depthwise conv 1.4-2.1x in isolation, but inside full training steps
    XLA fuses the FIR with neighbouring elementwise work and wins (SG2-1024
    case-2: 274 ms/step XLA vs 321 ms with Pallas FIRs; 256: 41 vs 43).
    The kernels remain available for standalone use and for backends whose
    conv fusion is weaker."""
    if explicit is not None:
        return explicit
    if os.environ.get("TPUGAN_PALLAS", "").lower() not in ("1", "true", "on"):
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

    The kernel taps must be concrete for the Pallas path (they are model
    constants everywhere); a traced kernel falls back to XLA. The taps are
    baked into a cached custom_vjp op — passing the kernel as a custom_vjp
    *argument* would trace it and silently disable the Pallas dispatch.
    """
    if isinstance(kernel, jax.core.Tracer):
        return _upfirdn2d_xla(x, kernel, up, down, tuple(pad), float(gain))
    taps = np.asarray(jax.device_get(kernel), dtype=np.float32)
    assert taps.ndim == 2
    op = _cached_op(
        taps.tobytes(), taps.shape, up, down, tuple(pad), float(gain),
        _use_pallas(use_pallas),
    )
    return op(x)


@functools.lru_cache(maxsize=256)
def _cached_op(taps_bytes, kshape, up, down, pad, gain, use_pallas):
    """Build a custom_vjp op with the concrete taps closed over."""
    # numpy (not jnp): constants built during tracing become tracers in
    # jax 0.9 and would poison the lru cache across traces
    kernel = np.frombuffer(taps_bytes, np.float32).reshape(kshape)
    kflip = kernel[::-1, ::-1].copy()
    kh, kw = kshape

    @jax.custom_vjp
    def op(x):
        return _dispatch(x, kernel, up, down, pad, gain, use_pallas)

    def fwd(x):
        out = op(x)
        return out, (x.shape[1], x.shape[2], out.shape[1], out.shape[2])

    def bwd(res, g):
        h, w, gh, gw = res
        # adjoint: stuff grad by ``down``, correlate with flipped taps,
        # decimate by ``up``; pads give exactly the input size back
        p0 = kh - 1 - pad[0]
        p1h = (h - 1) * up + 1 + pad[0] - gh * down
        p1w = (w - 1) * up + 1 + pad[0] - gw * down
        if p1h == p1w:
            dx = _dispatch(g, kflip, down, up, (p0, p1h), gain, use_pallas)
        else:  # non-square fallback: XLA with per-dim pads
            c = g.shape[-1]
            rhs = jnp.tile(
                (kflip * gain).astype(g.dtype)[:, :, None, None], (1, 1, 1, c)
            )
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
        return (dx,)

    op.defvjp(fwd, bwd)
    return op


def _dispatch(x, kernel, up, down, pad, gain, use_pallas):
    # Measured on v5e: pallas wins blur/down2 (1.9x), per-phase up2
    # (1.5-1.9x), and the flat-lane small-C same-size path (1.4-2.1x).
    c = x.shape[-1]
    if (
        use_pallas
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
