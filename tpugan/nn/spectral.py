"""Spectral normalization (power iteration) for trainable layers.

The frozen BigGAN generator has its spectral norms folded into the weights
at conversion time (biggan_generator.py:49-56 wrappers are inference-only),
but the *trainable* E_BIG encoder uses live spectral-norm linears inside
its conditional batch norms (model/E/E_BIG.py:30-31, 54-55). This module
provides the functional equivalent: the power-iteration vector lives in the
``sn`` variable collection and is updated when that collection is mutable
(torch updates it every training forward).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def _l2_normalize(x, eps):
    return x / (jnp.linalg.norm(x) + eps)


class SNDense(nn.Module):
    """Dense layer with spectral normalization (torch.nn.utils.spectral_norm
    semantics: one power iteration per forward, u persisted)."""

    features: int
    use_bias: bool = True
    eps: float = 1e-12

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (in_features, self.features),
        )
        u_var = self.variable(
            "sn", "u",
            lambda: _l2_normalize(
                jax.random.normal(self.make_rng("params") if self.has_rng("params")
                                  else jax.random.PRNGKey(0), (self.features,)),
                self.eps,
            ),
        )
        u = u_var.value
        # one power iteration (torch: v = normalize(W^T u), u = normalize(W v));
        # u/v are buffers (detached), sigma = u^T W v stays in the graph
        v = jax.lax.stop_gradient(_l2_normalize(kernel @ u, self.eps))
        u_new = jax.lax.stop_gradient(_l2_normalize(kernel.T @ v, self.eps))
        sigma = v @ kernel @ u_new
        if self.is_initializing() or self.is_mutable_collection("sn"):
            u_var.value = u_new
        y = x @ (kernel / sigma)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias
        return y
