"""SAGAN attention op: softmax(q @ k^T) @ v with a Pallas forward.

Dispatcher mirroring tpugan.ops.upfirdn: the Pallas flash-style kernel
(tpugan/ops/pallas/attention.py) runs the forward on TPU without
materialising the score matrix; the backward recomputes through the plain
einsum formulation (XLA), so the op stays differentiable for the
imgs2 = G(w2) gradient path in encoder training.
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _attention(q, k, v, use_pallas):
    return _attention_impl(q, k, v, use_pallas)


def _attention_impl(q, k, v, use_pallas):
    lq, lk = q.shape[1], k.shape[1]
    if use_pallas and lq % 128 == 0 and lk % 128 == 0:
        from tpugan.ops.pallas.attention import sagan_attention_pallas

        return sagan_attention_pallas(q, k, v)
    return _attention_xla(q, k, v)


def _attention_fwd(q, k, v, use_pallas):
    return _attention_impl(q, k, v, use_pallas), (q, k, v)


def _attention_bwd(use_pallas, res, g):
    q, k, v = res
    _, vjp = jax.vjp(_attention_xla, q, k, v)
    return vjp(g)


_attention.defvjp(_attention_fwd, _attention_bwd)


def sagan_attention(q, k, v, use_pallas: bool | None = None):
    """q [N, Lq, dk], k [N, Lk, dk], v [N, Lk, dv] -> [N, Lq, dv]."""
    return _attention(q, k, v, _use_pallas(use_pallas))
