"""EqLinear/EqConv parity vs the reference lreq layers (torch CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from tpugan.nn.layers import EqConv, EqLinear
from tpugan.ops.eq_lr import eq_lr_std, lreq_coef_tree


def to_nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


def from_nchw(x):
    return np.transpose(x, (0, 2, 3, 1))


def test_eq_linear_forward_and_coef(rng):
    x = rng.randn(4, 16).astype(np.float32)
    layer = EqLinear(8, gain=1.0, lrmul=0.01)
    variables = layer.init(jax.random.PRNGKey(0), jnp.asarray(x))
    w = np.asarray(variables["params"]["kernel"])
    b = np.asarray(variables["params"]["bias"])

    ref = torch.from_numpy(x) @ torch.from_numpy(w) + torch.from_numpy(b)
    got = layer.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-5, atol=1e-6)

    # coefficient bookkeeping matches lreq.Linear (std = gain/sqrt(in)*lrmul)
    assert np.isclose(float(variables["lreq"]["kernel_coef"]), eq_lr_std(16, 1.0, 0.01))
    assert np.isclose(float(variables["lreq"]["bias_coef"]), 0.01)
    # init std = std/lrmul = gain/sqrt(in)
    assert abs(w.std() - 1.0 / 4.0) < 0.05


def test_eq_conv_forward_matches_torch(rng):
    x = rng.randn(2, 8, 8, 4).astype(np.float32)
    layer = EqConv(6, 3, padding=1)
    variables = layer.init(jax.random.PRNGKey(0), jnp.asarray(x))
    w = np.asarray(variables["params"]["kernel"])  # HWIO
    b = np.asarray(variables["params"]["bias"])

    wt = torch.from_numpy(np.transpose(w, (3, 2, 0, 1)))  # OIHW
    ref = F.conv2d(torch.from_numpy(to_nchw(x)), wt, torch.from_numpy(b), padding=1)
    got = layer.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), from_nchw(ref.numpy()), rtol=1e-4, atol=1e-5)


def test_eq_conv_fused_scale_down_matches_torch(rng):
    """stride-2 conv with transform_kernel (lreq.py:143-147)."""
    x = rng.randn(2, 8, 8, 4).astype(np.float32)
    layer = EqConv(6, 3, stride=2, padding=1, use_bias=False, transform_kernel=True)
    variables = layer.init(jax.random.PRNGKey(0), jnp.asarray(x))
    w = np.asarray(variables["params"]["kernel"])

    wt = torch.from_numpy(np.transpose(w, (3, 2, 0, 1)))
    wt = F.pad(wt, (1, 1, 1, 1))
    wt = (wt[:, :, 1:, 1:] + wt[:, :, :-1, 1:] + wt[:, :, 1:, :-1] + wt[:, :, :-1, :-1]) * 0.25
    ref = F.conv2d(torch.from_numpy(to_nchw(x)), wt, stride=2, padding=1)
    got = layer.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), from_nchw(ref.numpy()), rtol=1e-4, atol=1e-5)


def test_eq_conv_transpose_fused_scale_up_matches_torch(rng):
    """transposed stride-2 conv with transform_kernel (lreq.py:127-142) —
    the StyleGANv1 fused upsample."""
    x = rng.randn(2, 4, 4, 8).astype(np.float32)
    layer = EqConv(6, 3, stride=2, padding=1, use_bias=False, transpose=True, transform_kernel=True)
    variables = layer.init(jax.random.PRNGKey(0), jnp.asarray(x))
    w = np.asarray(variables["params"]["kernel"])  # [kh, kw, in, out]

    wt = torch.from_numpy(np.transpose(w, (2, 3, 0, 1)))  # [in, out, kh, kw]
    wt = F.pad(wt, (1, 1, 1, 1))
    wt = wt[:, :, 1:, 1:] + wt[:, :, :-1, 1:] + wt[:, :, 1:, :-1] + wt[:, :, :-1, :-1]
    ref = F.conv_transpose2d(torch.from_numpy(to_nchw(x)), wt, stride=2, padding=1)
    got = layer.apply(variables, jnp.asarray(x))
    assert got.shape == (2, 8, 8, 6)
    np.testing.assert_allclose(np.asarray(got), from_nchw(ref.numpy()), rtol=1e-4, atol=1e-5)


def test_lreq_coef_tree_structure():
    layer = EqConv(6, 3, padding=1)
    variables = layer.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)))
    coefs = lreq_coef_tree(variables["params"], variables["lreq"])
    assert set(coefs.keys()) == set(variables["params"].keys())
    assert np.isclose(coefs["kernel"], eq_lr_std(3 * 3 * 4))
    assert coefs["bias"] == 1.0
