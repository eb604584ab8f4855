"""Blockwise (flash-style) attention for BigGAN's SelfAttn — Pallas TPU.

The reference materialises the full (h*w) x (h*w/4) score matrix through
torch.bmm (biggan_generator.py:85-92) — 4096x1024 fp32 per image at the
256 model's attention layer. These kernels stream key/value tiles with an
online softmax, so scores never hit HBM in EITHER direction: the forward
also emits the per-row logsumexp, and the backward kernels recompute
p = exp(q k^T - lse) tile-by-tile for dq / dk / dv (classic
FlashAttention backward, arXiv:2205.14135 §3.2).

attention(q [N, Lq, dk], k [N, Lk, dk], v [N, Lk, dv]) -> [N, Lq, dv]
with softmax over Lk — exactly ``softmax(q @ k^T) @ v`` (no 1/sqrt(dk)
scaling: the reference SAGAN layer applies none).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a, b):
    return -(-a // b)


def _fit_block(length, block):
    """Largest block <= ``block`` that divides ``length`` (callers
    guarantee length % 128 == 0, so this bottoms out at 128)."""
    block = min(block, length)
    while length % block:
        block //= 2
    assert block >= 128, (length, block)
    return block


def sagan_attention_pallas(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    block_q: int = 512,
    block_k: int = 512,
    interpret: bool = False,
    return_lse: bool = False,
):
    n, lq, dk = q.shape
    _, lk, dk2 = k.shape
    _, lk2, dv = v.shape
    assert dk == dk2 and lk == lk2

    block_q = _fit_block(lq, block_q)
    block_k = _fit_block(lk, block_k)
    nk = lk // block_k

    in_specs = [
        pl.BlockSpec((1, block_q, dk), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, lk, dk), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, lk, dv), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((1, block_q, dv), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    if not return_lse:
        # primal/eval path: no logsumexp output — skip the per-row log
        # and the (N, Lq, 1) HBM write entirely
        return pl.pallas_call(
            functools.partial(_fwd_kernel, nk=nk, block_k=block_k, with_lse=False),
            grid=(n, lq // block_q),
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((n, lq, dv), q.dtype),
            compiler_params=params,
            interpret=interpret,
        )(q, k, v)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, nk=nk, block_k=block_k, with_lse=True),
        grid=(n, lq // block_q),
        in_specs=in_specs,
        out_specs=(
            out_spec,
            # TPU block tiling wants the trailing dims (8,128)-aligned or
            # full — a trailing singleton keeps the row-vector legal
            pl.BlockSpec((1, block_q, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, lq, dv), q.dtype),
            jax.ShapeDtypeStruct((n, lq, 1), jnp.float32),
        ),
        compiler_params=params,
        interpret=interpret,
    )(q, k, v)
    return out, lse


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref=None, *, nk, block_k, with_lse=True):
    if not with_lse:
        lse_ref = None
    q = q_ref[0].astype(jnp.float32)  # [bq, dk]
    bq = q.shape[0]
    dv = v_ref.shape[-1]

    def body(i, carry):
        acc, m, l = carry  # [bq, dv], [bq, 1], [bq, 1]
        kt = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        vt = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, kt, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, bk]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, vt, preferred_element_type=jnp.float32)
        return acc, m_new, l

    acc = jnp.zeros((bq, dv), jnp.float32)
    m0 = jnp.full((bq, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, nk, body, (acc, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    if lse_ref is not None:
        lse_ref[0] = m + jnp.log(l)


def sagan_attention_bwd_pallas(
    q, k, v, o, lse, do,
    block_q: int = 512,
    block_k: int = 512,
    interpret: bool = False,
):
    """Flash backward: (dq, dk, dv) with p recomputed per tile from lse.

    delta = rowsum(do * o) is the softmax-jacobian correction term
    (FlashAttention-2 eq. 19); computed outside the kernels (one fused
    elementwise reduce, tiny).
    """
    n, lq, dk = q.shape
    _, lk, dv = v.shape
    block_q = _fit_block(lq, block_q)
    block_k = _fit_block(lk, block_k)
    nq, nk = lq // block_q, lk // block_k

    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True
    )  # [n, lq, 1]

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, nk=nk, block_k=block_k),
        grid=(n, nq),
        in_specs=[
            pl.BlockSpec((1, block_q, dk), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, dk), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, dv), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, dv), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, dk), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, lq, dk), q.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(q, k, v, lse, delta, do)

    dk_out, dv_out = pl.pallas_call(
        functools.partial(_dkv_kernel, nq=nq, block_q=block_q),
        grid=(n, nk),
        in_specs=[
            pl.BlockSpec((1, lq, dk), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dk), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dv), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lq, 1), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lq, 1), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lq, dv), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, dk), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dv), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, lk, dk), k.dtype),
            jax.ShapeDtypeStruct((n, lk, dv), v.dtype),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(q, k, v, lse, delta, do)
    return dq, dk_out, dv_out


def _dq_kernel(q_ref, k_ref, v_ref, lse_ref, delta_ref, do_ref, dq_ref, *, nk, block_k):
    q = q_ref[0].astype(jnp.float32)  # [bq, dk]
    do = do_ref[0].astype(jnp.float32)  # [bq, dv]
    lse = lse_ref[0]  # [bq, 1]
    delta = delta_ref[0]  # [bq, 1]
    dk_dim = q.shape[-1]
    bq = q.shape[0]

    def body(i, acc):
        kt = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        vt = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, kt, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, bk]
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do, vt, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, bk]
        ds = p * (dp - delta)
        return acc + jnp.dot(ds, kt, preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(0, nk, body, jnp.zeros((bq, dk_dim), jnp.float32))
    dq_ref[0] = acc.astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, lse_ref, delta_ref, do_ref, dk_ref, dv_ref, *, nq, block_q):
    kt = k_ref[0].astype(jnp.float32)  # [bk, dk]
    vt = v_ref[0].astype(jnp.float32)  # [bk, dv]
    bk, dk_dim = kt.shape
    dv_dim = vt.shape[-1]

    def body(j, carry):
        dk_acc, dv_acc = carry
        q = q_ref[0, pl.ds(j * block_q, block_q), :].astype(jnp.float32)  # [bq, dk]
        do = do_ref[0, pl.ds(j * block_q, block_q), :].astype(jnp.float32)  # [bq, dv]
        lse = lse_ref[0, pl.ds(j * block_q, block_q), :]  # [bq, 1]
        delta = delta_ref[0, pl.ds(j * block_q, block_q), :]
        s = jax.lax.dot_general(
            q, kt, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, bk]
        p = jnp.exp(s - lse)
        # dv += p^T @ do
        dv_acc = dv_acc + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            do, vt, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, bk]
        ds = p * (dp - delta)
        # dk += ds^T @ q
        dk_acc = dk_acc + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return dk_acc, dv_acc

    dk_acc = jnp.zeros((bk, dk_dim), jnp.float32)
    dv_acc = jnp.zeros((bk, dv_dim), jnp.float32)
    dk_acc, dv_acc = jax.lax.fori_loop(0, nq, body, (dk_acc, dv_acc))
    dk_ref[0] = dk_acc.astype(dk_ref.dtype)
    dv_ref[0] = dv_acc.astype(dv_ref.dtype)
