"""Blockwise SAGAN attention kernel vs the einsum reference."""

import jax
import jax.numpy as jnp
import numpy as np

from tpugan.ops.attention import _attention_xla, sagan_attention
from tpugan.ops.pallas.attention import sagan_attention_pallas


def test_pallas_attention_matches_einsum(rng):
    q = jnp.asarray(rng.randn(2, 256, 32).astype(np.float32))
    k = jnp.asarray(rng.randn(2, 128, 32).astype(np.float32))
    v = jnp.asarray(rng.randn(2, 128, 64).astype(np.float32))
    ref = _attention_xla(q, k, v)
    got = sagan_attention_pallas(q, k, v, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_pallas_attention_multi_tile(rng):
    """Several k tiles exercise the online-softmax accumulation."""
    q = jnp.asarray(rng.randn(1, 512, 16).astype(np.float32) * 3)
    k = jnp.asarray(rng.randn(1, 512, 16).astype(np.float32) * 3)
    v = jnp.asarray(rng.randn(1, 512, 32).astype(np.float32))
    ref = _attention_xla(q, k, v)
    got = sagan_attention_pallas(q, k, v, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_attention_grad_path(rng):
    """custom_vjp backward equals autodiff of the einsum form."""
    q = jnp.asarray(rng.randn(1, 64, 8).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 32, 8).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 32, 16).astype(np.float32))

    f1 = lambda q, k, v: jnp.sum(jnp.tanh(sagan_attention(q, k, v, use_pallas=False)))
    f2 = lambda q, k, v: jnp.sum(jnp.tanh(_attention_xla(q, k, v)))
    g1 = jax.grad(f1, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f2, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_flash_forward_lse(rng):
    """The saved logsumexp matches the direct computation."""
    q = jnp.asarray(rng.randn(2, 256, 16).astype(np.float32) * 2)
    k = jnp.asarray(rng.randn(2, 256, 16).astype(np.float32) * 2)
    v = jnp.asarray(rng.randn(2, 256, 32).astype(np.float32))
    out, lse = sagan_attention_pallas(
        q, k, v, block_q=128, block_k=128, interpret=True, return_lse=True
    )
    s = jnp.einsum("nqc,nkc->nqk", q, k)
    ref_lse = jax.scipy.special.logsumexp(s, axis=-1)
    np.testing.assert_allclose(
        np.asarray(lse)[..., 0], np.asarray(ref_lse), rtol=1e-5, atol=1e-5
    )


def test_flash_backward_matches_einsum_grads(rng):
    """dq/dk/dv from the Pallas flash backward vs autodiff of the einsum
    form — multiple q and k tiles, non-trivial upstream gradient."""
    from tpugan.ops.pallas.attention import sagan_attention_bwd_pallas

    q = jnp.asarray(rng.randn(2, 256, 16).astype(np.float32) * 2)
    k = jnp.asarray(rng.randn(2, 384, 16).astype(np.float32) * 2)
    v = jnp.asarray(rng.randn(2, 384, 32).astype(np.float32))
    g = jnp.asarray(rng.randn(2, 256, 32).astype(np.float32))

    ref, vjp = jax.vjp(_attention_xla, q, k, v)
    dq_ref, dk_ref, dv_ref = vjp(g)

    out, lse = sagan_attention_pallas(
        q, k, v, block_q=128, block_k=128, interpret=True, return_lse=True
    )
    dq, dk, dv = sagan_attention_bwd_pallas(
        q, k, v, out, lse, g, block_q=128, block_k=128, interpret=True
    )
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref), rtol=2e-4, atol=2e-4)
