"""SAGAN attention op: softmax(q @ k^T) @ v, flash in BOTH directions.

Dispatcher mirroring tpugan.ops.upfirdn: the Pallas flash-style kernels
(tpugan/ops/pallas/attention.py) run the forward AND the backward without
materialising the score matrix — the forward saves the per-row logsumexp
and the backward recomputes p per K-tile (FlashAttention backward), so the
imgs2 = G(w2) gradient path in encoder training never writes the
(h*w) x (h*w/4) scores to HBM in either direction. Shapes the kernels
can't tile (unaligned, or K/V too large for VMEM) fall back to the XLA
einsum formulation.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


def _use_pallas(explicit: bool | None) -> bool:
    # attention stays ON by default: unlike the FIR kernels it wins in
    # context too (979us vs 1221us at BigGAN-256 shapes) because the score
    # matrix materialisation is what XLA cannot fuse away
    if explicit is not None:
        return explicit
    if os.environ.get("TPUGAN_PALLAS", "").lower() in ("0", "false", "off"):
        return False
    dd = jax.config.jax_default_device
    if dd is not None and getattr(dd, "platform", None) != "tpu":
        return False
    return jax.default_backend() == "tpu"


def _attention_xla(q, k, v):
    s = jnp.einsum("nqc,nkc->nqk", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("nqk,nkc->nqc", p, v, preferred_element_type=jnp.float32).astype(
        q.dtype
    )


# conservative per-program VMEM budget for the whole-K/V-resident kernels;
# beyond it the op falls back to XLA rather than faulting the device
_VMEM_BUDGET_BYTES = 48 * 1024 * 1024

# measured on v5e at the BigGAN-256 attention shapes (2, 4096/1024, 64/256):
# the flash kernels win the forward alone (979 vs 1221 us) but LOSE the
# differentiated fwd+bwd (1413 vs 759 us) — XLA's fused einsum backward is
# faster while the 4096x1024 score matrix is still cache-sized. The flash
# backward therefore engages only when the score matrix is genuinely large
# (where materialising it costs real HBM traffic/memory).
_FLASH_BWD_MIN_SCORES = 64 * 1024 * 1024  # elements per batch item


def _pallas_ok(q, k, v):
    lq, lk, dk, dv = q.shape[1], k.shape[1], q.shape[2], v.shape[2]
    if lq % 128 or lk % 128:
        return False
    # fwd/dq keep full K+V per program; dkv keeps full Q+dO+O-row terms
    resident = 4 * max(lk * (dk + dv), lq * (dk + dv + 2))
    return resident < _VMEM_BUDGET_BYTES


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _attention(q, k, v, use_pallas):
    # primal (non-differentiated, eval/synthesis) path: flash forward wins
    if use_pallas and _pallas_ok(q, k, v):
        from tpugan.ops.pallas.attention import sagan_attention_pallas

        return sagan_attention_pallas(q, k, v)
    return _attention_xla(q, k, v)


def _attention_fwd(q, k, v, use_pallas):
    lq, lk = q.shape[1], k.shape[1]
    if use_pallas and _pallas_ok(q, k, v) and lq * lk >= _FLASH_BWD_MIN_SCORES:
        from tpugan.ops.pallas.attention import sagan_attention_pallas

        out, lse = sagan_attention_pallas(q, k, v, return_lse=True)
        return out, (q, k, v, out, lse)
    return _attention_xla(q, k, v), (q, k, v, None, None)


def _attention_bwd(use_pallas, res, g):
    q, k, v, out, lse = res
    if lse is not None:
        from tpugan.ops.pallas.attention import sagan_attention_bwd_pallas

        return sagan_attention_bwd_pallas(q, k, v, out, lse, g)
    _, vjp = jax.vjp(_attention_xla, q, k, v)
    return vjp(g)


_attention.defvjp(_attention_fwd, _attention_bwd)


def sagan_attention(q, k, v, use_pallas: bool | None = None):
    """q [N, Lq, dk], k [N, Lk, dk], v [N, Lk, dv] -> [N, Lq, dv]."""
    return _attention(q, k, v, _use_pallas(use_pallas))
