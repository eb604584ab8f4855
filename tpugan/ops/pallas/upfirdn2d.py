"""Pallas TPU kernel for upfirdn2d (separable FIR resample, NHWC).

The PyTorch reference emulates this op with pad + grouped conv
(model/stylegan1/net.py:48-58, model/stylegan2_generator.py:556-615); the
original StyleGAN2 ships it as a CUDA kernel (upfirdn2d.cu). Here it is a
native TPU kernel: one VMEM pass per row-tile performs zero-stuffing,
vertical FIR, horizontal FIR and decimation, so the up-sampled intermediate
is never materialised in HBM.

Strategy
--------
* The input is zero-pre-padded (XLA) so the kernel never masks boundaries;
  the row tile is a multiple of lcm(up, down) so all tap offsets are static.
* Grid = (N, H_out / TILE_H). Each program DMAs the needed input rows
  (halo included) from HBM into a VMEM scratch buffer, computes
  [TILE_H, W_out, C] and writes it through a blocked out_spec.
* Taps are unrolled python loops (kernels are 3 or 4 wide); decimation uses
  reshape-and-select instead of strided slices.

Supports up, down in {1, 2} and separable kernels up to 8 taps — everything
the model zoo uses. ``tpugan.ops.upfirdn.upfirdn2d`` falls back to the XLA
path for anything else.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, b: int) -> int:
    return _cdiv(a, b) * b


def upfirdn2d_pallas(
    x: jax.Array,
    kernel: jax.Array,
    up: int = 1,
    down: int = 1,
    pad: tuple[int, int] = (0, 0),
    interpret: bool = False,
) -> jax.Array:
    assert up in (1, 2) and down in (1, 2), "pallas path supports factors 1/2"
    n, h, w, c = x.shape
    kh, kw = kernel.shape
    assert kh == kw <= 8
    pad0, pad1 = pad
    assert pad0 >= 0 and pad1 >= 0, "negative pads take the XLA path"

    h_out = (h * up + pad0 + pad1 - kh) // down + 1
    w_out = (w * up + pad0 + pad1 - kw) // down + 1
    assert h_out > 0 and w_out > 0

    # Pre-pad so every in-kernel read is in range. The leading pad absorbs
    # pad0 up to a static phase `off` in stuffed coordinates, off in [0, up).
    ph0 = _cdiv(pad0, up)
    off = ph0 * up - pad0

    tile_h = _pick_tile_h(h_out, w, c, x.dtype, up, down)
    assert tile_h * down % up == 0
    # rows of (pre-padded) input read per tile, incl. halo and the extra
    # (down-1) slack the decimation reshape reads past the last output row
    tin = _cdiv(tile_h * down + kh - 1 + off, up) + (1 if up == 2 else 0)
    n_tiles = _cdiv(h_out, tile_h)
    i0_max = ((n_tiles - 1) * tile_h * down) // up
    ph1 = max(0, i0_max + tin - (h + ph0))
    pw0 = ph0
    pw1 = max(0, _cdiv(w_out * down + kw - 1 + off, up) + (1 if up == 2 else 0) - (w + pw0))
    # keep the DMA'd block's sublane dim (win) 8-aligned for Mosaic
    pw1 += (-(w + pw0 + pw1)) % 8

    xp = jnp.pad(x, ((0, 0), (ph0, ph1), (pw0, pw1), (0, 0)))
    win = xp.shape[2]

    kcol, krow = _separate(np.asarray(jax.device_get(kernel), dtype=np.float32))

    fn = functools.partial(
        _kernel,
        up=up,
        down=down,
        kcol=kcol,
        krow=krow,
        off=off,
        tile_h=tile_h,
        w_out=w_out,
    )
    out = pl.pallas_call(
        fn,
        grid=(n, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, tile_h, w_out, c), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, n_tiles * tile_h, w_out, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tin, win, c), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp)
    return out[:, :h_out] if n_tiles * tile_h != h_out else out


def upfirdn2d_pallas_small_c(
    x: jax.Array,
    kernel: jax.Array,
    pad: tuple[int, int] = (0, 0),
    interpret: bool = False,
) -> jax.Array:
    """Same-size FIR (up = down = 1) for small channel counts.

    The lane-tiled layout rejects C % 128 != 0, but for a same-size filter
    the (W, C) dims can be viewed as ONE flat lane dim (free reshape):
    horizontal taps become lane shifts by multiples of C. This is the hot
    E_Blur path at 1024^2 x 16 where XLA's depthwise conv runs at ~34 GB/s.
    Requires 128 % C == 0 so the flat width pads to lane alignment.
    """
    n, h, w, c = x.shape
    kh, kw = kernel.shape
    assert kh == kw <= 8 and 128 % c == 0
    pad0, pad1 = pad
    h_out = h + pad0 + pad1 - kh + 1
    w_out = w + pad0 + pad1 - kw + 1
    assert h_out > 0 and w_out > 0

    tile_h = _pick_tile_h(h_out, w, c, x.dtype, 1, 1)
    # rows are the sublane dim in the flat 2-D layout: the DMA'd row count
    # must be 8-aligned (offsets are, since tile_h is a multiple of 8)
    tin = _round_up(tile_h + kh - 1, 8)
    n_tiles = _cdiv(h_out, tile_h)
    ph1 = max(0, (n_tiles - 1) * tile_h + tin - (h + pad0))
    pw1 = max(0, w_out + kw - 1 - (w + pad0))
    pw1 += (-((w + pad0 + pw1) * c)) % 128 // c  # flat lane alignment

    xp = jnp.pad(x, ((0, 0), (pad0, ph1), (pad0, pw1), (0, 0)))
    win = xp.shape[2]
    flat = xp.reshape(n, xp.shape[1], win * c)

    kcol, krow = _separate(np.asarray(jax.device_get(kernel), dtype=np.float32))
    fn = functools.partial(
        _kernel_small_c, kcol=kcol, krow=krow, w_out=w_out, c=c
    )
    out = pl.pallas_call(
        fn,
        grid=(n, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, tile_h, w_out * c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, n_tiles * tile_h, w_out * c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tin, win * c), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(flat)
    out = out[:, :h_out] if n_tiles * tile_h != h_out else out
    return out.reshape(n, h_out, w_out, c)


def _kernel_small_c(x_hbm, out_ref, scratch, sem, *, kcol, krow, w_out, c):
    i = pl.program_id(0)
    j = pl.program_id(1)
    tile_h = out_ref.shape[1]
    tin = scratch.shape[0]
    dma = pltpu.make_async_copy(x_hbm.at[i, pl.ds(j * tile_h, tin)], scratch, sem)
    dma.start()
    dma.wait()
    x = scratch[:].astype(jnp.float32)  # [tin, win*c]
    # vertical taps on rows
    v = None
    for t, kt in enumerate(kcol):
        piece = x[t : t + tile_h] * kt
        v = piece if v is None else v + piece
    # horizontal taps: lane shifts by multiples of c
    o = None
    for t, kt in enumerate(krow):
        piece = v[:, t * c : (t + w_out) * c] * kt
        o = piece if o is None else o + piece
    out_ref[0] = o.astype(out_ref.dtype)


def _pick_tile_h(h_out, w, c, dtype, up, down, budget=24 * 1024 * 1024):
    """Row-tile size: multiple of 8 (sublane alignment, covers lcm(up, down)),
    sized to a VMEM budget."""
    itemsize = jnp.dtype(dtype).itemsize
    # dominant buffers: scratch [tin, win, c], stuffed copies, the per-tap
    # slices the compiler may materialise, and double-buffered output
    bytes_per_out_row = w * up * c * itemsize * 14
    t = max(8, budget // max(1, bytes_per_out_row))
    t = min(t, _round_up(h_out, 8))
    return max(8, (t // 8) * 8)


def _separate(k: np.ndarray):
    """Split a rank-1 (separable) 2-D kernel into column/row taps."""
    u, s, vt = np.linalg.svd(k)
    assert s[1:].max(initial=0.0) < 1e-5 * max(s[0], 1e-30), "kernel not separable"
    col = u[:, 0] * np.sqrt(s[0])
    row = vt[0] * np.sqrt(s[0])
    if col.sum() < 0:
        col, row = -col, -row
    return tuple(float(v) for v in col), tuple(float(v) for v in row)


def _stuff(x, up, axis):
    """Interleave zeros along ``axis`` (zero-stuffing by ``up``)."""
    if up == 1:
        return x
    zeros = jnp.zeros_like(x)
    stacked = jnp.stack([x, zeros], axis=axis + 1)
    shape = list(x.shape)
    shape[axis] = shape[axis] * up
    return stacked.reshape(shape)


def _fir_axis_up2(x, taps, off, out_len, axis):
    """2x-upsampling FIR without materialising the stuffed signal.

    out[2j+p] = sum over the taps t with (p+t+off) even of
    taps[t] * x[j + (p+t+off)//2]; the two phases are plain short FIRs on
    the raw samples, interleaved at the end — half the reads and no
    multiply-by-zero work compared to stuff-then-filter.
    """
    even_len = out_len + (out_len % 2)
    half = even_len // 2
    phases = []
    for p in (0, 1):
        acc = None
        for t, kt in enumerate(taps):
            if (p + t + off) % 2 != 0:
                continue
            shift = (p + t + off) // 2
            sl = [slice(None)] * x.ndim
            sl[axis] = slice(shift, shift + half)
            piece = x[tuple(sl)] * kt
            acc = piece if acc is None else acc + piece
        if acc is None:
            acc = jnp.zeros_like(phases[0]) if phases else None
        phases.append(acc)
    stacked = jnp.stack(phases, axis=axis + 1)
    shape = list(x.shape)
    shape[axis] = even_len
    out = stacked.reshape(shape)
    if even_len != out_len:
        sl = [slice(None)] * out.ndim
        sl[axis] = slice(0, out_len)
        out = out[tuple(sl)]
    return out


def _fir_axis(x, taps, off, out_len, down, axis):
    """out[i] = sum_t taps[t] * x[off + t + i*down] along ``axis`` (static)."""
    acc = None
    for t, kt in enumerate(taps):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(off + t, off + t + out_len * down)
        piece = x[tuple(sl)]
        if down > 1:
            shape = list(piece.shape)
            shape[axis : axis + 1] = [out_len, down]
            piece = piece.reshape(shape)
            sel = [slice(None)] * piece.ndim
            sel[axis + 1] = 0
            piece = piece[tuple(sel)]
        acc = piece * kt if acc is None else acc + piece * kt
    return acc


def _kernel(x_hbm, out_ref, scratch, sem, *, up, down, kcol, krow, off, tile_h, w_out):
    i = pl.program_id(0)
    j = pl.program_id(1)
    i0 = j * (tile_h * down // up)  # first pre-padded input row this tile reads

    tin = scratch.shape[0]
    dma = pltpu.make_async_copy(x_hbm.at[i, pl.ds(i0, tin)], scratch, sem)
    dma.start()
    dma.wait()

    x = scratch[:].astype(jnp.float32)  # [tin, win, c]
    # tile_h*down % up == 0 makes the per-tile phase static and equal to off.
    if up == 2 and down == 1:
        # per-phase 2x upsampling FIR: no stuffed intermediates
        v = _fir_axis_up2(x, kcol, off, tile_h, axis=0)
        o = _fir_axis_up2(v, krow, off, w_out, axis=1)
    else:
        # vertical: stuff rows, FIR, decimate -> [tile_h, win, c]
        xv = _stuff(x, up, axis=0)
        v = _fir_axis(xv, kcol, off, tile_h, down, axis=0)
        # horizontal: stuff cols, FIR, decimate -> [tile_h, w_out, c]
        vh = _stuff(v, up, axis=1)
        o = _fir_axis(vh, krow, off, w_out, down, axis=1)
    out_ref[0] = o.astype(out_ref.dtype)
