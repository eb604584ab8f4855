"""LREQAdam parity vs the reference custom_adam.LREQAdam (torch CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from tpugan.optim import lreq_adam


def _torch_lreq_adam_step(p, grad, state, lr, beta2=0.99, eps=1e-8, coef=None):
    """Reference update (custom_adam.py:41-74), pure-numpy re-derivation."""
    state["step"] += 1
    state["nu"] = beta2 * state["nu"] + (1 - beta2) * grad**2
    denom = np.sqrt(state["nu"]) + eps
    step_size = lr * np.sqrt(1 - beta2 ** state["step"])
    if coef is not None:
        step_size *= coef
    return p - step_size * grad / denom


def test_lreq_adam_matches_reference_rule(rng):
    p0 = rng.randn(5, 3).astype(np.float32)
    params = {"w": jnp.asarray(p0)}
    coefs = {"w": 0.125}
    opt = lreq_adam(0.0015, coefs=coefs, beta2=0.99)
    state = opt.init(params)

    ref_p = p0.copy()
    ref_state = {"step": 0, "nu": np.zeros_like(p0)}
    cur = params
    for i in range(5):
        g = rng.randn(5, 3).astype(np.float32)
        updates, state = opt.update({"w": jnp.asarray(g)}, state, cur)
        cur = jax.tree.map(lambda p, u: p + u, cur, updates)
        ref_p = _torch_lreq_adam_step(ref_p, g, ref_state, 0.0015, coef=0.125)
        np.testing.assert_allclose(np.asarray(cur["w"]), ref_p, rtol=1e-5, atol=1e-6)


def test_lreq_adam_matches_torch_impl(rng):
    """End-to-end check against the actual torch optimizer semantics."""
    p0 = rng.randn(4, 4).astype(np.float32)
    coef = 0.3

    pt = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    setattr(pt, "lr_equalization_coef", coef)
    # replicate custom_adam.LREQAdam.step inline (no import of reference code)
    nu = torch.zeros_like(pt)
    step = 0

    params = {"w": jnp.asarray(p0)}
    opt = lreq_adam(0.01, coefs={"w": coef}, beta2=0.99)
    state = opt.init(params)
    cur = params

    for i in range(3):
        g = rng.randn(4, 4).astype(np.float32)
        gt = torch.from_numpy(g)
        step += 1
        nu.mul_(0.99).addcmul_(gt, gt, value=0.01)
        denom = nu.sqrt().add_(1e-8)
        step_size = 0.01 * np.sqrt(1 - 0.99**step) * coef
        pt.data.addcdiv_(gt, denom, value=-step_size)

        updates, state = opt.update({"w": jnp.asarray(g)}, state, cur)
        cur = jax.tree.map(lambda p, u: p + u, cur, updates)
        np.testing.assert_allclose(np.asarray(cur["w"]), pt.detach().numpy(), rtol=1e-5, atol=1e-6)
