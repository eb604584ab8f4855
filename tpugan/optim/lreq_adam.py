"""LREQAdam as an optax gradient transformation.

Reference: model/utils/custom_adam.py:6-76 — Adam with beta1 forced to 0
(no first moment), bias correction applied to the second moment only
(``step_size = lr * sqrt(1 - beta2^t)``), and the per-parameter step size
multiplied by the equalized-LR coefficient planted on each parameter
(custom_adam.py:66-74). Here the coefficients come in as a pytree (see
``tpugan.ops.eq_lr.lreq_coef_tree``) instead of attribute tags.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


class LreqAdamState(NamedTuple):
    count: jax.Array  # int32 step counter
    nu: Any  # second-moment EMA, same structure as params


def lreq_adam(
    learning_rate: float,
    coefs: Any = None,
    beta2: float = 0.99,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """Build the LREQAdam transform.

    ``coefs``: pytree matching the params (leaves: float coefficient), or
    None for all-ones (plain no-momentum Adam). The returned updates are
    ``-lr * sqrt(1-beta2^t) * coef * g / (sqrt(nu) + eps)`` — identical to
    the reference update rule custom_adam.py:62-74.
    """

    def init_fn(params):
        nu = jax.tree.map(jnp.zeros_like, params)
        return LreqAdamState(count=jnp.zeros([], jnp.int32), nu=nu)

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        nu = jax.tree.map(
            lambda v, g: beta2 * v + (1.0 - beta2) * jnp.square(g), state.nu, updates
        )
        bias_correction2 = 1.0 - beta2 ** count.astype(jnp.float32)
        step_size = learning_rate * jnp.sqrt(bias_correction2)

        if coefs is None:
            new_updates = jax.tree.map(
                lambda g, v: -step_size * g / (jnp.sqrt(v) + eps), updates, nu
            )
        else:
            new_updates = jax.tree.map(
                lambda g, v, c: -(step_size * c) * g / (jnp.sqrt(v) + eps),
                updates,
                nu,
                coefs,
            )
        return new_updates, LreqAdamState(count=count, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)
