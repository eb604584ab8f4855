"""StyleGANv1 generator/mapping parity vs reference math (torch CPU).

The torch snippets below re-derive the reference ops (net.py:110-169,
441-466) on tensors converted from the flax params, with noise injected
explicitly so both sides see identical randomness.
"""

import math

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from tpugan.models.stylegan1 import (
    StyleGANv1Generator,
    StyleGANv1Mapping,
    StyleGANv1Discriminator,
    truncation_coefs,
)


def to_nchw(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


def from_nchw(x):
    return np.transpose(np.asarray(x), (0, 2, 3, 1))


def t(x):
    return torch.from_numpy(np.asarray(x).copy())


def torch_blur(x, c):
    f = np.array([1, 2, 1], dtype=np.float32)
    k = np.outer(f, f)
    k /= k.sum()
    w = torch.from_numpy(np.tile(k[None, None], (c, 1, 1, 1)))
    return F.conv2d(x, w, groups=c, padding=1)


def torch_instance_norm(x):
    return F.instance_norm(x, eps=1e-8)


def torch_style_mod(x, style):
    s = style.view(style.shape[0], 2, x.shape[1], 1, 1)
    return s[:, 1] + x * (s[:, 0] + 1)


def torch_decode_block(x, p, s1, s2, n1, n2, fused, has_first_conv):
    """Reference DecodeBlock.forward (net.py:141-169) from flax params ``p``."""
    if has_first_conv:
        if fused:
            w = t(p["conv_1"]["kernel"])  # [kh,kw,in,out]
            wt = w.permute(2, 3, 0, 1)  # [in,out,kh,kw]
            wt = F.pad(wt, (1, 1, 1, 1))
            wt = wt[:, :, 1:, 1:] + wt[:, :, :-1, 1:] + wt[:, :, 1:, :-1] + wt[:, :, :-1, :-1]
            x = F.conv_transpose2d(x, wt, stride=2, padding=1)
        else:
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            w = t(p["conv_1"]["kernel"]).permute(3, 2, 0, 1)
            x = F.conv2d(x, w, padding=1)
        x = torch_blur(x, x.shape[1])
    x = x + t(p["noise_weight_1"]).view(1, -1, 1, 1) * n1
    x = x + t(p["bias_1"]).view(1, -1, 1, 1)
    x = F.leaky_relu(x, 0.2)
    x = torch_instance_norm(x)
    style1 = s1 @ t(p["style_1"]["kernel"]) + t(p["style_1"]["bias"])
    x = torch_style_mod(x, style1)

    w = t(p["conv_2"]["kernel"]).permute(3, 2, 0, 1)
    x = F.conv2d(x, w, padding=1)
    x = x + t(p["noise_weight_2"]).view(1, -1, 1, 1) * n2
    x = x + t(p["bias_2"]).view(1, -1, 1, 1)
    x = F.leaky_relu(x, 0.2)
    x = torch_instance_norm(x)
    style2 = s2 @ t(p["style_2"]["kernel"]) + t(p["style_2"]["bias"])
    x = torch_style_mod(x, style2)
    return x


@pytest.mark.slow
def test_generator_matches_torch_reference(rng):
    """Full Gs.decode for a small fused+unfused ladder vs torch re-derivation."""
    layer_count, startf, maxf, latent = 3, 32, 128, 64
    gen = StyleGANv1Generator(
        startf=startf, maxf=maxf, layer_count=layer_count, latent_size=latent
    )
    styles = jnp.asarray(rng.randn(2, 2 * layer_count, latent).astype(np.float32))
    noises = []
    res = 4
    for i in range(layer_count):
        noises.append(
            (
                jnp.asarray(rng.randn(2, res, res, 1).astype(np.float32)),
                jnp.asarray(rng.randn(2, res, res, 1).astype(np.float32)),
            )
        )
        res *= 2 if i < layer_count - 1 else 1

    variables = gen.init(jax.random.PRNGKey(1), styles, layer_count - 1, 1.0, noises)
    # randomize params that default to zeros/ones for a stronger check
    params = jax.tree.map(
        lambda x: jnp.asarray(rng.randn(*x.shape).astype(np.float32) * 0.1), variables["params"]
    )
    variables = {**variables, "params": params}
    out = gen.apply(variables, styles, layer_count - 1, 1.0, noises)

    # torch side
    p = jax.tree.map(np.asarray, params)
    x = t(np.transpose(p["const"], (0, 3, 1, 2))).repeat(2, 1, 1, 1)
    st = t(styles)
    mul = 2 ** (layer_count - 1)
    resolution = 2
    for i in range(layer_count):
        fused = resolution * 2 >= 128
        noise_nchw = (
            t(to_nchw(noises[i][0])),
            t(to_nchw(noises[i][1])),
        )
        x = torch_decode_block(
            x, p[f"decode_block_{i}"], st[:, 2 * i], st[:, 2 * i + 1],
            noise_nchw[0], noise_nchw[1], fused, i != 0,
        )
        resolution *= 2
    wrgb = t(p[f"to_rgb_{layer_count - 1}"]["to_rgb"]["kernel"]).permute(3, 2, 0, 1)
    brgb = t(p[f"to_rgb_{layer_count - 1}"]["to_rgb"]["bias"])
    ref = F.conv2d(x, wrgb, brgb)

    np.testing.assert_allclose(to_nchw(out), ref.numpy(), rtol=2e-3, atol=2e-4)


@pytest.mark.slow
def test_generator_fused_scale_at_high_res():
    """Resolution >= 128 uses the fused transpose conv path; shape check."""
    gen = StyleGANv1Generator(startf=8, maxf=64, layer_count=6, latent_size=32)
    styles = jnp.zeros((1, 12, 32))
    variables = gen.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, styles)
    out = gen.apply(variables, styles, rngs={"noise": jax.random.PRNGKey(2)})
    assert out.shape == (1, 128, 128, 3)


def test_mapping_matches_torch(rng):
    latent = 64
    num_layers = 6
    m = StyleGANv1Mapping(
        num_layers=num_layers, mapping_layers=3, latent_size=latent,
        dlatent_size=latent, mapping_fmaps=latent,
    )
    z = jnp.asarray(rng.randn(4, latent).astype(np.float32))
    center = jnp.asarray(rng.randn(num_layers, latent).astype(np.float32))
    coefs = truncation_coefs(num_layers, 0.7)
    variables = m.init(jax.random.PRNGKey(0), z)
    out = m.apply(variables, z, coefs, center)

    p = jax.tree.map(np.asarray, variables["params"])
    x = t(z)
    x = x * torch.rsqrt(torch.mean(x.pow(2.0), dim=1, keepdim=True) + 1e-8)
    for i in range(3):
        blk = p[f"block_{i + 1}"]["fc"]
        x = F.leaky_relu(x @ t(blk["kernel"]) + t(blk["bias"]), 0.2)
    x = x.view(4, 1, latent).repeat(1, num_layers, 1)
    ref = torch.lerp(t(center), x, t(np.asarray(coefs)))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_mapping_layer_count_scaling():
    m = StyleGANv1Mapping(num_layers=18)
    z = jnp.zeros((2, 512))
    variables = m.init(jax.random.PRNGKey(0), z)
    assert m.apply(variables, z).shape == (2, 18, 512)


@pytest.mark.slow
def test_discriminator_shapes():
    d = StyleGANv1Discriminator(startf=16, maxf=64, layer_count=4)
    x = jnp.zeros((2, 32, 32, 3))
    variables = d.init(jax.random.PRNGKey(0), x)
    out = d.apply(variables, x)
    assert out.shape == (2, 1)


@pytest.mark.slow
@pytest.mark.heavy
def test_decode3_blob_removal_and_mapping_variants(rng):
    from tpugan.models.stylegan1 import (
        StyleGANv1Mapping2,
        StyleGANv1Mapping3,
        StyleGANv1Mapping4,
    )

    gen = StyleGANv1Generator(startf=8, maxf=32, layer_count=5, latent_size=16)
    styles = jnp.asarray(rng.randn(1, 10, 16).astype(np.float32))
    variables = gen.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, styles
    )
    out = gen.apply(
        variables, styles, 4, rngs={"noise": jax.random.PRNGKey(2)},
        method=lambda m, s, lod: m.decode3(s, lod),
    )
    # lod < 8 returns the normalized grayscale heatmap in [0, 1]
    assert out.shape == (1, 64, 64, 3)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0 + 1e-5

    z = jnp.asarray(rng.randn(2, 512).astype(np.float32))
    m2 = StyleGANv1Mapping2(num_layers=18, mapping_layers=3)
    v = m2.init(jax.random.PRNGKey(0), z)
    assert m2.apply(v, z).shape == (2, 18, 512)
    m2i = StyleGANv1Mapping2(num_layers=18, mapping_layers=3, inverse=True)
    wp = jnp.asarray(rng.randn(2, 18, 512).astype(np.float32))
    v = m2i.init(jax.random.PRNGKey(0), wp)
    assert m2i.apply(v, wp).shape == (2, 512)
    m3 = StyleGANv1Mapping3()
    v = m3.init(jax.random.PRNGKey(0), z)
    assert m3.apply(v, z).shape == (2, 18, 512)
    m4 = StyleGANv1Mapping4()
    v = m4.init(jax.random.PRNGKey(0), wp)
    assert m4.apply(v, wp).shape == (2, 512)
