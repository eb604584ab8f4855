"""PGGAN generator/discriminator parity vs torch re-derivation."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from tpugan.models.pggan import PGGANDiscriminator, PGGANGenerator


def t(x):
    return torch.from_numpy(np.asarray(x).copy())


def to_nchw(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


def torch_pg_conv(x, p, k, pad, gain, act, upsample=False, fused=False):
    """Reference generator ConvBlock.forward (pggan_generator.py:319-339)."""
    x = x / torch.sqrt(torch.mean(x**2, dim=1, keepdim=True) + 1e-8)
    in_c = x.shape[1]
    w = t(p["weight"])  # HWIO
    wscale = gain / math.sqrt(k * k * in_c)
    if upsample and fused:
        wt = w.permute(2, 3, 0, 1) * wscale  # [in, out, kh, kw]
        wt = F.pad(wt, (1, 1, 1, 1))
        wt = wt[:, :, 1:, 1:] + wt[:, :, :-1, 1:] + wt[:, :, 1:, :-1] + wt[:, :, :-1, :-1]
        return act(F.conv_transpose2d(x, wt, t(p["bias"]), stride=2, padding=1))
    if upsample:
        x = F.interpolate(x, scale_factor=2, mode="nearest")
    wt = w.permute(3, 2, 0, 1) * wscale  # OIHW
    return act(F.conv2d(x, wt, t(p["bias"]), padding=pad))


def lrelu(x):
    return F.leaky_relu(x, 0.2)


@pytest.mark.slow
def test_pggan_generator_matches_torch(rng):
    gen = PGGANGenerator(resolution=16, z_space_dim=32, fmaps_base=64, fmaps_max=16)
    z = jnp.asarray(rng.randn(2, 32).astype(np.float32))
    variables = gen.init(jax.random.PRNGKey(0), z)
    params = jax.tree.map(
        lambda v: jnp.asarray(rng.randn(*v.shape).astype(np.float32) * 0.5), variables["params"]
    )
    out = gen.apply({"params": params}, z)["image"]

    p = jax.tree.map(np.asarray, params)
    zt = t(np.asarray(z))
    zt = zt / torch.sqrt(torch.mean(zt**2, dim=1, keepdim=True) + 1e-8)
    x = zt.view(2, 32, 1, 1)
    nf = lambda res: min(64 // res, 16)
    # 4x4 "Dense" conv: k=4, pad=3
    x = torch_pg_conv(x, p["layer0"], 4, 3, math.sqrt(2), lrelu)
    x = torch_pg_conv(x, p["layer1"], 3, 1, math.sqrt(2), lrelu)
    # 8x8
    x = torch_pg_conv(x, p["layer2"], 3, 1, math.sqrt(2), lrelu, upsample=True)
    x = torch_pg_conv(x, p["layer3"], 3, 1, math.sqrt(2), lrelu)
    # 16x16
    x = torch_pg_conv(x, p["layer4"], 3, 1, math.sqrt(2), lrelu, upsample=True)
    x = torch_pg_conv(x, p["layer5"], 3, 1, math.sqrt(2), lrelu)
    ref = torch_pg_conv(x, p["output2"], 1, 0, 1.0, lambda v: v)
    np.testing.assert_allclose(to_nchw(out), ref.numpy(), rtol=2e-3, atol=1e-4)


@pytest.mark.slow
def test_pggan_generator_fused_scale(rng):
    gen = PGGANGenerator(resolution=8, z_space_dim=16, fmaps_base=32, fmaps_max=8, fused_scale=True)
    z = jnp.asarray(rng.randn(1, 16).astype(np.float32))
    variables = gen.init(jax.random.PRNGKey(0), z)
    params = jax.tree.map(
        lambda v: jnp.asarray(rng.randn(*v.shape).astype(np.float32) * 0.5), variables["params"]
    )
    out = gen.apply({"params": params}, z)["image"]
    assert out.shape == (1, 8, 8, 3)

    p = jax.tree.map(np.asarray, params)
    zt = t(np.asarray(z))
    zt = zt / torch.sqrt(torch.mean(zt**2, dim=1, keepdim=True) + 1e-8)
    x = zt.view(1, 16, 1, 1)
    x = torch_pg_conv(x, p["layer0"], 4, 3, math.sqrt(2), lrelu)
    x = torch_pg_conv(x, p["layer1"], 3, 1, math.sqrt(2), lrelu)
    x = torch_pg_conv(x, p["layer2"], 3, 1, math.sqrt(2), lrelu, upsample=True, fused=True)
    x = torch_pg_conv(x, p["layer3"], 3, 1, math.sqrt(2), lrelu)
    ref = torch_pg_conv(x, p["output1"], 1, 0, 1.0, lambda v: v)
    np.testing.assert_allclose(to_nchw(out), ref.numpy(), rtol=2e-3, atol=1e-4)


@pytest.mark.slow
def test_pggan_generator_progressive_lod(rng):
    gen = PGGANGenerator(resolution=16, z_space_dim=32, fmaps_base=64, fmaps_max=16)
    z = jnp.asarray(rng.randn(2, 32).astype(np.float32))
    variables = gen.init(jax.random.PRNGKey(0), z)
    # lod=1 renders at 8x8 then upsamples to 16
    img_lod1 = gen.apply(variables, z, lod=1.0)["image"]
    assert img_lod1.shape == (2, 16, 16, 3)
    # fractional lod blends
    img_half = gen.apply(variables, z, lod=0.5)["image"]
    img0 = gen.apply(variables, z, lod=0.0)["image"]
    blend = 0.5 * img0 + 0.5 * img_lod1
    np.testing.assert_allclose(np.asarray(img_half), np.asarray(blend), rtol=1e-3, atol=1e-5)


@pytest.mark.slow
def test_pggan_discriminator_shapes_and_lod(rng):
    d = PGGANDiscriminator(resolution=16, fmaps_base=64, fmaps_max=16, minibatch_std_group_size=2)
    x = jnp.asarray(rng.randn(2, 16, 16, 3).astype(np.float32))
    variables = d.init(jax.random.PRNGKey(0), x)
    out = d.apply(variables, x)
    assert out.shape == (2, 1)
    out1 = d.apply(variables, x, lod=1.0)
    assert out1.shape == (2, 1)


def test_pggan_invalid_args(rng):
    gen = PGGANGenerator(resolution=16, z_space_dim=32, fmaps_base=64, fmaps_max=16)
    z = jnp.zeros((1, 32))
    variables = gen.init(jax.random.PRNGKey(0), z)
    try:
        gen.apply(variables, z, lod=5.0)
        assert False, "expected ValueError"
    except ValueError as e:
        assert "maximum lod" in str(e)
    try:
        gen.apply(variables, jnp.zeros((1, 7)))
        assert False, "expected ValueError"
    except ValueError as e:
        assert "latent code" in str(e)
