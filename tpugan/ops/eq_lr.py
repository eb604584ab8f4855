"""Equalized learning-rate bookkeeping.

The reference's lreq layers (model/utils/lreq.py:39-175) initialise weights
at He-std and tag each parameter with ``lr_equalization_coef``; LREQAdam then
multiplies the per-parameter step size by that coefficient
(model/utils/custom_adam.py:71-74). Here the same scheme is functional: flax
modules store the coefficient in a dedicated ``lreq`` variable collection and
``tpugan.optim.lreq_adam`` consumes a pytree of coefficients.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def eq_lr_std(fan_in: int, gain: float = math.sqrt(2.0), lrmul: float = 1.0) -> float:
    """The equalized-LR std: gain / sqrt(fan_in) * lrmul.

    Matches model/utils/lreq.py:55 (Linear) and :113 (Conv2d, where
    fan_in = prod(kernel) * in_channels // groups).
    """
    return gain / math.sqrt(fan_in) * lrmul


def transform_kernel_2d(w: jax.Array, average: bool) -> jax.Array:
    """4-tap kernel smoothing used by fused-scale convs.

    Pads the spatial dims by 1 and sums the four diagonal shifts, yielding a
    (k+1)x(k+1) kernel; forward (stride-2) convs also multiply by 0.25
    (model/utils/lreq.py:129-131 transpose, :145-147 forward).

    ``w`` is HWIO: [kh, kw, in, out].
    """
    w = jnp.pad(w, ((1, 1), (1, 1), (0, 0), (0, 0)))
    w = w[1:, 1:] + w[:-1, 1:] + w[1:, :-1] + w[:-1, :-1]
    if average:
        w = w * 0.25
    return w


def lreq_coef_tree(params, lreq, default: float = 1.0):
    """Build a per-parameter coefficient pytree matching ``params``.

    ``params`` is a flax param tree; ``lreq`` is the parallel ``lreq``
    collection whose leaves are named ``<param_name>_coef``. Parameters
    without a coefficient (e.g. plain biases, const inputs) get ``default``.
    Returns a pytree of python floats with the same structure as params.
    """
    flat_params = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_lreq = {
        tuple(str(k) for k in path): leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(lreq)[0]
    }
    out = {}
    for path, _ in flat_params:
        keypath = tuple(str(k) for k in path)
        coef_path = keypath[:-1] + (str(jax.tree_util.DictKey(_coef_name(path))),)
        leaf = flat_lreq.get(coef_path)
        out[path] = float(leaf) if leaf is not None else default
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(
        treedef, [out[path] for path, _ in flat_params]
    )


def _coef_name(path) -> str:
    last = path[-1]
    name = last.key if hasattr(last, "key") else str(last)
    return f"{name}_coef"
