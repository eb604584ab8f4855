"""Blockwise (flash-style) attention for BigGAN's SelfAttn — Pallas TPU.

The reference materialises the full (h*w) x (h*w/4) score matrix through
torch.bmm (biggan_generator.py:85-92) — 4096x1024 fp32 per image at the
256 model's attention layer. This kernel streams key/value tiles with an
online softmax, so scores never hit HBM; queries are tiled over the grid.

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


def sagan_attention_pallas(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    block_q: int = 512,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    n, lq, dk = q.shape
    _, lk, dk2 = k.shape
    _, lk2, dv = v.shape
    assert dk == dk2 and lk == lk2

    block_q = min(block_q, lq)
    block_k = min(block_k, lk)
    assert lq % block_q == 0 and lk % block_k == 0, "sequence not tile-aligned"
    nk = lk // block_k

    fn = functools.partial(_kernel, nk=nk, block_k=block_k)
    out = pl.pallas_call(
        fn,
        grid=(n, lq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, dk), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, dk), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, dv), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, dv), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, lq, dv), q.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(q, k, v)
    return out


def _kernel(q_ref, k_ref, v_ref, o_ref, *, nk, block_k):
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
