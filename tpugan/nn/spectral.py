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


def _l2_normalize_rows(x, eps):
    """Per-row l2 normalize for [G, n] stacks — row g matches
    ``_l2_normalize(x[g])`` (same sum-of-squares reduction per row)."""
    return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + eps)


def encode_accepts_sn(encode) -> bool:
    """Whether an encode closure takes the live spectral-norm collection
    as its trailing ``sn`` argument (the threading convention used by the
    train steps, the bf16 wrapper and the embedder)."""
    import inspect

    return "sn" in inspect.signature(encode).parameters


def power_iterate(params, sn, n_iter: int = 1, eps: float = 1e-12):
    """One (or n) power-iteration steps of every SNDense u/v pair in ``sn``
    against the current kernels in ``params`` — the functional equivalent
    of torch's in-place buffer update on each training forward.

    The iteration touches only the kernel and the stored vectors (no
    activations), so training steps refresh the ``sn`` collection with
    this pure function and thread it through their state (see
    EncoderTrainState.sn); gradients never flow into it (matching torch's
    no_grad update).

    Cadence: torch advances u/v once per *encoder forward*. The training
    loops run one E forward per iteration (one autograd graph, E_align
    scripts), so the default ``n_iter=1`` per step matches exactly. The
    inversion loop runs two E forwards per iteration in optimize-E mode
    (E(imgs1) + E(imgs2), embedding_v2_BigGAN.py:92-94) and one in
    optimize-w mode — callers there pass ``n_iter`` to match (see
    invert/embedding.py).
    """
    if sn is None:
        return None

    # E_BIG carries ~32 u/v pairs; iterating them one matvec at a time is
    # ~200 tiny sequential TPU ops (~4 ms of pure per-op overhead on a
    # ~25 ms step, measured). Kernels of equal shape stack into one
    # batched einsum per direction instead — same per-pair reductions
    # (the g axis is independent), a handful of ops total.
    entries: list = []  # (path, kernel, u, v) in deterministic walk order

    def collect(p_node, s_node, path):
        if isinstance(s_node, dict):
            if set(s_node.keys()) == {"u", "v"}:
                entries.append(
                    (path, jax.lax.stop_gradient(p_node["kernel"]),
                     s_node["u"], s_node["v"])
                )
                return
            for k, v_ in s_node.items():
                collect(p_node[k], v_, path + (k,))

    collect(params, sn, ())

    groups: dict = {}  # kernel shape -> list of entry indices
    for i, e in enumerate(entries):
        groups.setdefault(e[1].shape, []).append(i)

    updated: dict = {}
    for idx in groups.values():
        kern = jnp.stack([entries[i][1] for i in idx])  # [G, in, out]
        u = jnp.stack([entries[i][2] for i in idx])     # [G, out]
        v = jnp.stack([entries[i][3] for i in idx])     # [G, in]
        for _ in range(n_iter):
            v = _l2_normalize_rows(jnp.einsum("gio,go->gi", kern, u), eps)
            u = _l2_normalize_rows(jnp.einsum("gi,gio->go", v, kern), eps)
        for j, i in enumerate(idx):
            updated[entries[i][0]] = {"u": u[j], "v": v[j]}

    def rebuild(s_node, path):
        if isinstance(s_node, dict):
            if set(s_node.keys()) == {"u", "v"}:
                return updated[path]
            return {k: rebuild(v_, path + (k,)) for k, v_ in s_node.items()}
        return s_node

    return rebuild(sn, ())


class SNDense(nn.Module):
    """Dense layer with spectral normalization — exact
    torch.nn.utils.spectral_norm semantics (n_power_iterations=1):

      * training forward (``sn`` collection mutable): v = normalize(W^T u),
        u = normalize(W v), both persisted; sigma from the updated pair.
      * eval forward (``sn`` immutable): sigma = u . (W v) from the stored
        pair, no iteration.

    kernel is stored [in, out] = W^T, so u has shape [out] and v [in],
    matching torch's ``weight_u`` / ``weight_v`` buffers directly.
    """

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

        def init_u():
            key = (
                self.make_rng("params") if self.has_rng("params")
                else jax.random.PRNGKey(0)
            )
            return _l2_normalize(jax.random.normal(key, (self.features,)), self.eps)

        u_var = self.variable("sn", "u", init_u)
        v_var = self.variable(
            "sn", "v", lambda: _l2_normalize(kernel @ u_var.value, self.eps)
        )
        u, v = u_var.value, v_var.value
        if self.is_mutable_collection("sn") and not self.is_initializing():
            # one power iteration, buffers detached (torch compute_weight)
            v = jax.lax.stop_gradient(_l2_normalize(kernel @ u, self.eps))
            u = jax.lax.stop_gradient(_l2_normalize(v @ kernel, self.eps))
            u_var.value, v_var.value = u, v
        # u/v persist in fp32; sigma math in fp32, the normalized kernel
        # back in the compute dtype so bf16 inputs don't promote
        k32 = kernel.astype(jnp.float32)
        sigma = (v.astype(jnp.float32) @ k32 @ u.astype(jnp.float32)).astype(kernel.dtype)
        y = x @ (kernel / sigma)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias
        return y
