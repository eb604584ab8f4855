"""Encoder (BE family) structural + parity tests."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from tpugan.models.encoders import Encoder, EncoderBlock


def t(x):
    return torch.from_numpy(np.asarray(x).copy())


def to_nchw(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


@pytest.mark.slow
def test_encoder_shapes_case1():
    """BE for 256x256 (startf=64, layer_count=7): const [N,4,4,512], w [N,14,512]."""
    enc = Encoder(startf=64, maxf=512, layer_count=7, latent_size=512)
    x = jnp.zeros((2, 256, 256, 3))
    variables = enc.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, x)
    const, w = enc.apply(variables, x, rngs={"noise": jax.random.PRNGKey(2)})
    assert const.shape == (2, 4, 4, 512)
    assert w.shape == (2, 14, 512)


@pytest.mark.slow
def test_encoder_block_matches_torch_reference(rng):
    """BEBlock forward (E.py:50-85) with injected noise."""
    cin, cout, latent = 8, 16, 32
    blk = EncoderBlock(in_features=cin, out_features=cout, latent_size=latent)
    x = jnp.asarray(rng.randn(2, 16, 16, cin).astype(np.float32))
    n1 = jnp.asarray(rng.randn(2, 16, 16, 1).astype(np.float32))
    n2 = jnp.asarray(rng.randn(2, 16, 16, 1).astype(np.float32))
    variables = blk.init(jax.random.PRNGKey(0), x, (n1, n2))
    params = jax.tree.map(
        lambda v: jnp.asarray(rng.randn(*v.shape).astype(np.float32) * 0.1), variables["params"]
    )
    variables = {**variables, "params": params}
    out, w1, w2 = blk.apply(variables, x, (n1, n2))

    p = jax.tree.map(np.asarray, params)
    xt = t(to_nchw(x))
    mean1 = xt.mean(dim=[2, 3], keepdim=True)
    std1 = torch.sqrt(((xt - mean1) ** 2).mean(dim=[2, 3], keepdim=True))
    style1 = torch.cat((mean1, std1), dim=1).view(2, 2 * cin)
    ref_w1 = style1 @ t(p["inver_mod1"]["kernel"]) + t(p["inver_mod1"]["bias"])
    np.testing.assert_allclose(np.asarray(w1), ref_w1.numpy(), rtol=1e-4, atol=1e-5)

    residual = xt
    y = F.instance_norm(xt, eps=1e-8)
    y = F.conv2d(y, t(p["conv_1"]["kernel"]).permute(3, 2, 0, 1), padding=1)
    y = y + t(p["noise_weight_1"]).view(1, -1, 1, 1) * t(to_nchw(n1))
    y = y + t(p["bias_1"]).view(1, -1, 1, 1)
    y = F.leaky_relu(y, 0.2)

    mean2 = y.mean(dim=[2, 3], keepdim=True)
    std2 = torch.sqrt(((y - mean2) ** 2).mean(dim=[2, 3], keepdim=True))
    style2 = torch.cat((mean2, std2), dim=1).view(2, 2 * cin)
    ref_w2 = style2 @ t(p["inver_mod2"]["kernel"]) + t(p["inver_mod2"]["bias"])
    np.testing.assert_allclose(np.asarray(w2), ref_w2.numpy(), rtol=1e-4, atol=1e-5)

    y = F.instance_norm(y, eps=1e-8)
    y = F.conv2d(y, t(p["conv_2"]["kernel"]).permute(3, 2, 0, 1), padding=1)
    y = y + t(p["noise_weight_2"]).view(1, -1, 1, 1) * t(to_nchw(n2))
    y = y + t(p["bias_2"]).view(1, -1, 1, 1)
    y = F.leaky_relu(y, 0.2)
    y = F.avg_pool2d(y, 2, 2)
    residual = F.avg_pool2d(residual, 2, 2)
    residual = F.conv2d(
        residual, t(p["conv_3"]["kernel"]).permute(3, 2, 0, 1), t(p["conv_3"]["bias"])
    )
    ref = 0.111 * y + 0.889 * residual
    np.testing.assert_allclose(to_nchw(out), ref.numpy(), rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_encoder_w_ordering(rng):
    """Per-block pairs are (w2, w1) with the deepest block first (E.py:126-134)."""
    enc = Encoder(startf=4, maxf=16, layer_count=3, latent_size=8)
    x = jnp.asarray(rng.randn(1, 16, 16, 3).astype(np.float32))
    variables = enc.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, x)

    # capture per-block outputs by calling blocks manually through capture
    _, w = enc.apply(variables, x, rngs={"noise": jax.random.PRNGKey(2)})
    assert w.shape == (1, 6, 8)


@pytest.mark.slow
def test_encoder_blur_variant_shapes():
    """E_Blur at 1024: fused-scale convs at res >= 128."""
    enc = Encoder(startf=16, maxf=512, layer_count=9, use_blur=True)
    x = jnp.zeros((1, 1024, 1024, 3))
    variables = enc.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, x)
    const, w = enc.apply(variables, x, rngs={"noise": jax.random.PRNGKey(2)})
    assert const.shape == (1, 4, 4, 512)
    assert w.shape == (1, 18, 512)
    # fused-scale blocks exist: conv_2 kernel shape 3x3 but stride handled inside
    assert "conv_2" in variables["params"]["block_0"]


@pytest.mark.slow
def test_encoder_ablation_variants():
    x = jnp.zeros((1, 16, 16, 3))
    # no noise (E_Blur_W)
    enc = Encoder(startf=4, maxf=16, layer_count=3, latent_size=8, use_noise=False)
    v = enc.init(jax.random.PRNGKey(0), x)
    _, w = enc.apply(v, x)
    assert w.shape == (1, 6, 8)
    assert "noise_weight_1" not in v["params"]["block_0"]
    # single w per block (E_Blur_W_2)
    enc = Encoder(startf=4, maxf=16, layer_count=3, latent_size=8, style_mode="single")
    v = enc.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, x)
    _, w = enc.apply(v, x, rngs={"noise": jax.random.PRNGKey(2)})
    assert w.shape == (1, 6, 8)
    # z-only (E_Blur_Z)
    enc = Encoder(startf=4, maxf=16, layer_count=3, latent_size=8, style_mode="none")
    v = enc.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, x)
    const, w = enc.apply(v, x, rngs={"noise": jax.random.PRNGKey(2)})
    assert w is None and const.shape == (1, 4, 4, 16)


@pytest.mark.slow
def test_encoder_std_only_stats(rng):
    """E_v2_std: inver_mod heads consume std only (half-width input)."""
    enc = Encoder(startf=4, maxf=16, layer_count=3, latent_size=8, style_stats="std")
    x = jnp.asarray(rng.randn(1, 16, 16, 3).astype(np.float32))
    v = enc.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, x)
    # first block: inputs=4 -> std-only stats give kernel [4, 8]
    assert v["params"]["block_0"]["inver_mod1"]["kernel"].shape == (4, 8)
    _, w = enc.apply(v, x, rngs={"noise": jax.random.PRNGKey(2)})
    assert w.shape == (1, 6, 8)


def test_encoder_v1_block_ordering(rng):
    """E_v1: conv before IN, resnet residual, no 0.111 mix (E_v1.py:67-100)."""
    enc = Encoder(startf=4, maxf=16, layer_count=3, latent_size=8, block_version=1)
    x = jnp.asarray(rng.randn(1, 16, 16, 3).astype(np.float32))
    v = enc.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, x)
    const, w = enc.apply(v, x, rngs={"noise": jax.random.PRNGKey(2)})
    assert w.shape == (1, 6, 8)
    assert "in3_scale" in v["params"]["block_0"]  # affine IN on the bypass
