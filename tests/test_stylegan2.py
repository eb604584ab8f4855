"""StyleGAN2 parity vs torch re-derivation of the reference blocks.

The torch side below reimplements the *fused* modulated conv exactly as the
reference does (stylegan2_generator.py:855-922: per-sample weight scaling,
demodulation, grouped conv with groups=batch) — proving our TPU-native
input-scale/output-demod formulation is numerically identical.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from tpugan.models.stylegan2 import (
    ModulatedConv,
    SG2Dense,
    SG2Mapping,
    SG2Truncation,
    StyleGAN2Generator,
)


def t(x):
    return torch.from_numpy(np.asarray(x).copy())


def to_nchw(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


def torch_upfirdn_filter(x, kernel, gain, pad):
    """UpsamplingLayer with scale_factor=1 (stylegan2_generator.py:603-615)."""
    c = x.shape[1]
    k = torch.from_numpy(np.asarray(kernel) * gain).float()
    x = x.reshape(-1, 1, x.shape[2], x.shape[3])
    x = F.pad(x, (pad[0], pad[1], pad[0], pad[1]))
    x = F.conv2d(x, k[None, None], stride=1)
    return x.reshape(-1, c, x.shape[2], x.shape[3])


def torch_modconv_fused(x, w, params, in_c, out_c, ksize, demodulate, up, noise, noise_strength, bias, act):
    """Reference fused ModulateConvBlock.forward (:855-922)."""
    batch = x.shape[0]
    weight = t(params["weight"])  # [k,k,in,out] (ours) -> matches :859 permute
    wscale = 1.0 / math.sqrt(ksize * ksize * in_c)
    weight = weight * wscale
    style_w = t(params["style"]["weight"]) * (1.0 / math.sqrt(512))
    style = w @ style_w + t(params["style"]["bias"]) + 1.0  # additional_bias=1

    _weight = weight.view(1, ksize, ksize, in_c, out_c)
    _weight = _weight * style.view(batch, 1, 1, in_c, 1)
    if demodulate:
        _weight_norm = torch.sqrt(torch.sum(_weight**2, dim=[1, 2, 3]) + 1e-8)
        _weight = _weight / _weight_norm.view(batch, 1, 1, 1, out_c)

    x = x.reshape(1, batch * in_c, x.shape[2], x.shape[3])
    wf = _weight.permute(1, 2, 3, 0, 4).reshape(ksize, ksize, in_c, batch * out_c)
    if up:
        wf = wf.flip(0, 1)
        wf = wf.view(ksize, ksize, in_c, batch, out_c).permute(0, 1, 4, 3, 2)
        wf = wf.reshape(ksize, ksize, out_c, batch * in_c).permute(3, 2, 0, 1)
        x = F.conv_transpose2d(x, wf, stride=2, padding=0, groups=batch)
        x = torch_upfirdn_filter(
            x, np.outer([1, 3, 3, 1], [1, 3, 3, 1]) / 64.0, 4.0, (1, 1)
        )
        res = x.shape[2]
    else:
        wf = wf.permute(3, 2, 0, 1)
        x = F.conv2d(x, wf, stride=1, padding=ksize // 2, groups=batch)
        res = x.shape[2]
    x = x.view(batch, out_c, res, res)
    if noise is not None:
        x = x + noise * noise_strength
    if bias is not None:
        x = x + bias.view(1, -1, 1, 1)
    if act == "lrelu":
        x = F.leaky_relu(x, 0.2) * math.sqrt(2.0)
    return x, style


def _mk_params(rng, shapes):
    return {k: rng.randn(*s).astype(np.float32) * 0.5 for k, s in shapes.items()}


def run_modconv_case(rng, up, demodulate, ksize=3, in_c=8, out_c=16, res_in=8):
    wdim = 512
    res_out = res_in * 2 if up else res_in
    mod = ModulatedConv(
        in_channels=in_c, out_channels=out_c, resolution=res_out,
        w_space_dim=wdim, kernel_size=ksize, scale_factor=2 if up else 1,
        demodulate=demodulate, add_noise=True,
    )
    x = jnp.asarray(rng.randn(2, res_in, res_in, in_c).astype(np.float32))
    w = jnp.asarray(rng.randn(2, wdim).astype(np.float32))
    variables = mod.init(jax.random.PRNGKey(0), x, w)
    params = {
        "weight": rng.randn(ksize, ksize, in_c, out_c).astype(np.float32) * 0.5,
        "noise_strength": np.float32(0.7),
        "bias": rng.randn(out_c).astype(np.float32) * 0.1,
        "style": {
            "weight": rng.randn(wdim, in_c).astype(np.float32) * 0.5,
            "bias": rng.randn(in_c).astype(np.float32) * 0.1,
        },
    }
    variables = {
        "params": jax.tree.map(jnp.asarray, params),
        "buffers": variables["buffers"],
    }
    out, style = mod.apply(variables, x, w)

    noise = t(np.transpose(np.asarray(variables["buffers"]["noise"]), (0, 3, 1, 2)))
    ref, ref_style = torch_modconv_fused(
        t(to_nchw(x)), t(np.asarray(w)), params, in_c, out_c, ksize,
        demodulate, up, noise, float(params["noise_strength"]), t(params["bias"]), "lrelu",
    )
    np.testing.assert_allclose(np.asarray(style), ref_style.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(to_nchw(out), ref.numpy(), rtol=2e-3, atol=1e-4)


def test_modconv_plain(rng):
    run_modconv_case(rng, up=False, demodulate=True)


def test_modconv_upsample(rng):
    run_modconv_case(rng, up=True, demodulate=True)


def test_modconv_no_demod(rng):
    run_modconv_case(rng, up=False, demodulate=False)


def test_dense_block_matches_torch(rng):
    d = SG2Dense(16, additional_bias=1.0, activation_type="linear")
    x = jnp.asarray(rng.randn(4, 32).astype(np.float32))
    variables = d.init(jax.random.PRNGKey(0), x)
    p = jax.tree.map(np.asarray, variables["params"])
    out = d.apply(variables, x)
    ref = t(np.asarray(x)) @ t(p["weight"]) * (1.0 / math.sqrt(32)) + t(p["bias"]) + 1.0
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_truncation_module(rng):
    tr = SG2Truncation(w_space_dim=16, num_layers=6)
    w = jnp.asarray(rng.randn(2, 16).astype(np.float32))
    variables = tr.init(jax.random.PRNGKey(0), w)
    w_avg = jnp.asarray(rng.randn(16).astype(np.float32))
    variables = {"buffers": {"w_avg": w_avg}}
    wp = tr.apply(variables, w, 0.7, 4)
    assert wp.shape == (2, 6, 16)
    # layers >= trunc_layers are untruncated
    full = jnp.repeat(w[:, None, :], 6, axis=1)
    np.testing.assert_allclose(np.asarray(wp[:, 4:]), np.asarray(full[:, 4:]), rtol=1e-5)
    ref = w_avg[None] + (w - w_avg[None]) * 0.7
    np.testing.assert_allclose(np.asarray(wp[:, 0]), np.asarray(ref), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_full_generator_contract(rng):
    """Result-dict contract + shapes for a small config (:500,:538)."""
    gen = StyleGAN2Generator(resolution=16, fmaps_base=64, fmaps_max=16)
    z = jnp.asarray(rng.randn(2, 512).astype(np.float32))
    variables = gen.init({"params": jax.random.PRNGKey(0)}, z)
    out = gen.apply(variables, z, trunc_psi=0.7, trunc_layers=4)
    assert out["image"].shape == (2, 16, 16, 3)
    assert out["wp"].shape == (2, 6, 512)
    assert out["w"].shape == (2, 512)
    assert "style00" in out and "output_style2" in out
    # synthesis-only entry (the reference's generator.synthesis(w2)['image'])
    out2 = gen.apply(variables, out["wp"], method=gen.synthesize)
    np.testing.assert_allclose(
        np.asarray(out2["image"]), np.asarray(out["image"]), rtol=1e-4, atol=1e-5
    )


@pytest.mark.slow
def test_resnet_architecture(rng):
    gen = StyleGAN2Generator(resolution=16, fmaps_base=64, fmaps_max=16, architecture="resnet")
    z = jnp.asarray(rng.randn(1, 512).astype(np.float32))
    variables = gen.init({"params": jax.random.PRNGKey(0)}, z)
    out = gen.apply(variables, z)
    assert out["image"].shape == (1, 16, 16, 3)


def test_mapping_label_concat(rng):
    m = SG2Mapping(label_size=10, num_layers=2)
    z = jnp.asarray(rng.randn(2, 512).astype(np.float32))
    label = jax.nn.one_hot(jnp.asarray([1, 5]), 10)
    variables = m.init(jax.random.PRNGKey(0), z, label)
    out = m.apply(variables, z, label)
    assert out["w"].shape == (2, 512)
    assert out["embedding"].shape == (2, 512)
