"""BigGAN generator + E_BIG/E_PG encoder tests (parity vs torch snippets)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from tpugan.models.biggan import (
    BigGAN,
    BigGANBatchNorm,
    BigGANConfig,
    GenBlock,
    SelfAttn,
)
from tpugan.models.encoders import BigGANEncoder, PGEncoder


def t(x):
    return torch.from_numpy(np.asarray(x).copy())


def to_nchw(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


def tiny_config(**kw):
    d = dict(
        output_dim=16,
        z_dim=8,
        class_embed_dim=8,
        channel_width=4,
        num_classes=10,
        layers=[(False, 16, 16), (True, 16, 8), (False, 8, 4), (True, 4, 2), (False, 2, 1)],
        attention_layer_position=1,
        eps=1e-4,
        n_stats=51,
    )
    d.update(kw)
    return BigGANConfig(**d)


def test_selfattn_matches_torch(rng):
    ch = 16
    attn = SelfAttn(ch)
    x = jnp.asarray(rng.randn(2, 8, 8, ch).astype(np.float32))
    variables = attn.init(jax.random.PRNGKey(0), x)
    params = jax.tree.map(
        lambda v: jnp.asarray(rng.randn(*v.shape).astype(np.float32) * 0.3), variables["params"]
    )
    out = attn.apply({"params": params}, x)

    p = jax.tree.map(np.asarray, params)
    xt = t(to_nchw(x))
    n, c, h, w = xt.shape

    def conv1x1(x_, kern):  # flax kernel [1,1,in,out] -> torch OIHW
        wt = t(kern).permute(3, 2, 0, 1)
        return F.conv2d(x_, wt)

    theta = conv1x1(xt, p["snconv1x1_theta"]["kernel"]).view(n, c // 8, h * w)
    phi = F.max_pool2d(conv1x1(xt, p["snconv1x1_phi"]["kernel"]), 2, 2).view(n, c // 8, h * w // 4)
    a = torch.softmax(torch.bmm(theta.permute(0, 2, 1), phi), dim=-1)
    g = F.max_pool2d(conv1x1(xt, p["snconv1x1_g"]["kernel"]), 2, 2).view(n, c // 2, h * w // 4)
    attn_g = torch.bmm(g, a.permute(0, 2, 1)).view(n, c // 2, h, w)
    attn_g = conv1x1(attn_g, p["snconv1x1_o_conv"]["kernel"])
    ref = xt + t(p["gamma"]).view(1, 1, 1, 1) * attn_g
    np.testing.assert_allclose(to_nchw(out), ref.numpy(), rtol=2e-3, atol=1e-4)


def test_biggan_batchnorm_matches_torch(rng):
    bn = BigGANBatchNorm(8, condition_vector_dim=16, n_stats=11, eps=1e-4)
    x = jnp.asarray(rng.randn(2, 4, 4, 8).astype(np.float32))
    cv = jnp.asarray(rng.randn(2, 16).astype(np.float32))
    variables = bn.init(jax.random.PRNGKey(0), x, 0.45, cv)
    buffers = {
        "running_means": jnp.asarray(rng.randn(11, 8).astype(np.float32)),
        "running_vars": jnp.asarray(rng.rand(11, 8).astype(np.float32) + 0.5),
    }
    variables = {"params": variables["params"], "buffers": buffers}
    out = bn.apply(variables, x, 0.45, cv)

    p = jax.tree.map(np.asarray, variables["params"])
    step = 1.0 / 10
    coef, start = math.modf(0.45 / step)
    start = int(start)
    rm = np.asarray(buffers["running_means"])
    rv = np.asarray(buffers["running_vars"])
    mean = rm[start] * coef + rm[start + 1] * (1 - coef)
    var = rv[start] * coef + rv[start + 1] * (1 - coef)
    scale = np.asarray(cv) @ p["scale"]["kernel"]
    offset = np.asarray(cv) @ p["offset"]["kernel"]
    xt = np.asarray(x)
    ref = (xt - mean) / np.sqrt(var + 1e-4) * (1 + scale[:, None, None, :]) + offset[:, None, None, :]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_genblock_channel_drop_and_upsample(rng):
    blk = GenBlock(in_size=16, out_size=8, condition_vector_dim=16, up_sample=True, n_stats=5)
    x = jnp.asarray(rng.randn(2, 4, 4, 16).astype(np.float32))
    cv = jnp.asarray(rng.randn(2, 16).astype(np.float32))
    variables = blk.init(jax.random.PRNGKey(0), x, cv, 0.5)
    out = blk.apply(variables, x, cv, 0.5)
    assert out.shape == (2, 8, 8, 8)


@pytest.mark.slow
def test_full_biggan_forward(rng):
    cfg = tiny_config()
    model = BigGAN(cfg)
    z = jnp.asarray(rng.randn(2, cfg.z_dim).astype(np.float32))
    label = jax.nn.one_hot(jnp.asarray([3, 7]), cfg.num_classes)
    variables = model.init(jax.random.PRNGKey(0), z, label, 0.4)
    image, cond = model.apply(variables, z, label, 0.4)
    assert image.shape == (2, 16, 16, 3)
    assert cond.shape == (2, 2 * cfg.z_dim)
    assert float(jnp.max(jnp.abs(image))) <= 1.0  # tanh range


def test_biggan_config_json_roundtrip(tmp_path):
    cfg = tiny_config()
    path = tmp_path / "config.json"
    path.write_text(cfg.to_json_string())
    cfg2 = BigGANConfig.from_json_file(path)
    assert cfg2.layers == cfg.layers
    assert cfg2.attention_layer_position == 1


def test_biggan_config_for_resolution_layouts():
    """The three zoo presets (biggan_file_utils.py:34-36 checkpoints) produce
    their nominal resolution: 4x4 const doubled once per up layer, and the
    SelfAttn at position 8 always sits at 64x64."""
    for res, n_layers in [(128, 10), (256, 12), (512, 14)]:
        cfg = BigGANConfig.for_resolution(res, z_dim=8)
        assert len(cfg.layers) == n_layers
        ups = sum(1 for up, _, _ in cfg.layers if up)
        assert 4 * 2**ups == res == cfg.output_dim
        assert cfg.z_dim == 8
        # attention position 8 = after 4 up layers in every layout
        assert sum(1 for up, _, _ in cfg.layers[: cfg.attention_layer_position] if up) == 4
    assert BigGANConfig.for_resolution(128).layers == BigGANConfig().layers
    with pytest.raises(ValueError):
        BigGANConfig.for_resolution(64)


@pytest.mark.slow
def test_biggan_512_layout_forward():
    """A thin-width biggan-deep-512 layout runs end-to-end and emits
    512x512 RGB (the widest zoo config; biggan_generator.py:313-314)."""
    # width 4 keeps the GenBlock bottleneck (in_ch // 4) nonzero at the
    # (1, 1)-mul top layers while staying CPU-cheap
    cfg = BigGANConfig.for_resolution(
        512, z_dim=8, class_embed_dim=8, channel_width=4, num_classes=10, n_stats=3
    )
    model = BigGAN(cfg)
    z = jnp.zeros((1, 8))
    label = jax.nn.one_hot(jnp.array([3]), 10)
    variables = model.init(jax.random.PRNGKey(0), z, label, 0.4)
    image, cond = model.apply(variables, z, label, 0.4)
    assert image.shape == (1, 512, 512, 3)
    assert cond.shape == (1, 16)
    assert bool(jnp.all(jnp.isfinite(image)))


@pytest.mark.slow
def test_pg_encoder_shapes(rng):
    enc = PGEncoder(startf=64, maxf=512, layer_count=7, latent_size=512)
    x = jnp.zeros((2, 256, 256, 3))
    variables = enc.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, x)
    feats, z = enc.apply(variables, x, rngs={"noise": jax.random.PRNGKey(2)})
    assert feats.shape == (2, 4, 4, 512)
    assert z.shape == (2, 512)


@pytest.mark.slow
def test_biggan_encoder_shapes(rng):
    enc = BigGANEncoder(startf=64, maxf=512, layer_count=7)
    x = jnp.zeros((2, 256, 256, 3))
    cv = jnp.zeros((2, 256))
    variables = enc.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, x, cv
    )
    c_v, z = enc.apply(variables, x, cv, rngs={"noise": jax.random.PRNGKey(2)})
    assert c_v.shape == (2, 256)
    assert z.shape == (2, 128)
    assert "sn" in variables  # live spectral norm state exists


def test_sndense_matches_torch_spectral_norm(rng):
    from tpugan.nn.spectral import SNDense

    layer = SNDense(6, use_bias=False)
    x = jnp.asarray(rng.randn(3, 4).astype(np.float32))
    variables = layer.init(jax.random.PRNGKey(0), x)
    k = np.asarray(variables["params"]["kernel"])  # [in, out]
    u0 = np.asarray(variables["sn"]["u"])

    lin = torch.nn.Linear(4, 6, bias=False)
    with torch.no_grad():
        lin.weight.copy_(t(k.T))
    sn = torch.nn.utils.spectral_norm(lin, eps=1e-12)
    with torch.no_grad():
        sn.weight_u.copy_(t(u0))
    sn.train()
    ref = sn(t(np.asarray(x)))

    out, updates = layer.apply(variables, x, mutable=["sn"])
    np.testing.assert_allclose(np.asarray(out), ref.detach().numpy(), rtol=1e-4, atol=1e-5)
    # u vector advanced identically
    np.testing.assert_allclose(
        np.asarray(updates["sn"]["u"]), sn.weight_u.detach().numpy(), rtol=1e-4, atol=1e-5
    )
