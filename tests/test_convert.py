"""Checkpoint-converter roundtrips: synthetic torch-layout state dicts ->
tpugan pytrees -> forward parity vs torch re-derivations."""

import math

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

import test_stylegan1 as ts1
from tpugan.io import convert
from tpugan.models.stylegan1 import StyleGANv1Generator, StyleGANv1Mapping
from tpugan.models.stylegan2 import StyleGAN2Generator


@pytest.mark.slow
def test_stylegan1_generator_roundtrip(rng):
    """Reference-named Gs state dict (incl. a fused block) -> our params."""
    layer_count, startf, maxf, latent = 7, 8, 32, 16  # reaches 256 -> fused blocks
    state = {}
    mul = 2 ** (layer_count - 1)
    inputs = min(maxf, startf * mul)
    state["const"] = rng.randn(1, inputs, 4, 4).astype(np.float32)
    resolution = 2
    chans = []
    for i in range(layer_count):
        outputs = min(maxf, startf * mul)
        fused = resolution * 2 >= 128
        src = f"decode_block.{i}."
        if i != 0:
            if fused:
                state[src + "conv_1.weight"] = rng.randn(inputs, outputs, 3, 3).astype(np.float32) * 0.3
            else:
                state[src + "conv_1.weight"] = rng.randn(outputs, inputs, 3, 3).astype(np.float32) * 0.3
        state[src + "conv_2.weight"] = rng.randn(outputs, outputs, 3, 3).astype(np.float32) * 0.3
        for nm, c in [("noise_weight_1", outputs), ("noise_weight_2", outputs), ("bias_1", outputs), ("bias_2", outputs)]:
            state[src + nm] = rng.randn(1, c, 1, 1).astype(np.float32) * 0.1
        for s in ("style_1", "style_2"):
            state[src + s + ".weight"] = rng.randn(2 * outputs, latent).astype(np.float32) * 0.3
            state[src + s + ".bias"] = rng.randn(2 * outputs).astype(np.float32) * 0.1
        state[f"to_rgb.{i}.to_rgb.weight"] = rng.randn(3, outputs, 1, 1).astype(np.float32) * 0.3
        state[f"to_rgb.{i}.to_rgb.bias"] = rng.randn(3).astype(np.float32) * 0.1
        chans.append((inputs, outputs, fused))
        inputs = outputs
        resolution *= 2
        mul //= 2

    params = convert.stylegan1_generator(state, layer_count)
    gen = StyleGANv1Generator(startf=startf, maxf=maxf, layer_count=layer_count, latent_size=latent)

    styles = jnp.asarray(rng.randn(1, 2 * layer_count, latent).astype(np.float32))
    noises = []
    res = 4
    for i in range(layer_count):
        noises.append(
            (
                jnp.asarray(rng.randn(1, res, res, 1).astype(np.float32)),
                jnp.asarray(rng.randn(1, res, res, 1).astype(np.float32)),
            )
        )
        if i < layer_count - 1:
            res *= 2
    out = gen.apply(
        {"params": jax.tree.map(jnp.asarray, params)}, styles, layer_count - 1, 1.0, noises
    )

    # torch side straight from the state dict
    x = torch.from_numpy(state["const"]).repeat(1, 1, 1, 1)
    st = torch.from_numpy(np.asarray(styles))
    resolution = 2
    for i in range(layer_count):
        cin, cout, fused = chans[i]
        p = {
            "conv_2": {"kernel": convert.conv_w(state[f"decode_block.{i}.conv_2.weight"])},
            "noise_weight_1": convert.chan(state[f"decode_block.{i}.noise_weight_1"]),
            "noise_weight_2": convert.chan(state[f"decode_block.{i}.noise_weight_2"]),
            "bias_1": convert.chan(state[f"decode_block.{i}.bias_1"]),
            "bias_2": convert.chan(state[f"decode_block.{i}.bias_2"]),
            "style_1": {
                "kernel": convert.linear_w(state[f"decode_block.{i}.style_1.weight"]),
                "bias": state[f"decode_block.{i}.style_1.bias"],
            },
            "style_2": {
                "kernel": convert.linear_w(state[f"decode_block.{i}.style_2.weight"]),
                "bias": state[f"decode_block.{i}.style_2.bias"],
            },
        }
        if i != 0:
            w = state[f"decode_block.{i}.conv_1.weight"]
            p["conv_1"] = {"kernel": convert.convT_w(w) if fused else convert.conv_w(w)}
        n1 = torch.from_numpy(np.transpose(np.asarray(noises[i][0]), (0, 3, 1, 2)))
        n2 = torch.from_numpy(np.transpose(np.asarray(noises[i][1]), (0, 3, 1, 2)))
        x = ts1.torch_decode_block(x, p, st[:, 2 * i], st[:, 2 * i + 1], n1, n2, fused, i != 0)
        resolution *= 2
    wrgb = torch.from_numpy(state[f"to_rgb.{layer_count - 1}.to_rgb.weight"])
    brgb = torch.from_numpy(state[f"to_rgb.{layer_count - 1}.to_rgb.bias"])
    ref = F.conv2d(x, wrgb, brgb)
    np.testing.assert_allclose(ts1.to_nchw(out), ref.detach().numpy(), rtol=5e-3, atol=5e-4)


def test_stylegan1_mapping_roundtrip(rng):
    latent = 16
    state = {}
    for i in range(1, 9):
        state[f"block_{i}.fc.weight"] = rng.randn(latent, latent).astype(np.float32) * 0.3
        state[f"block_{i}.fc.bias"] = rng.randn(latent).astype(np.float32) * 0.1
    params = convert.stylegan1_mapping(state)
    m = StyleGANv1Mapping(
        num_layers=6, mapping_layers=8, latent_size=latent, dlatent_size=latent, mapping_fmaps=latent
    )
    z = jnp.asarray(rng.randn(2, latent).astype(np.float32))
    out = m.apply({"params": jax.tree.map(jnp.asarray, params)}, z)

    x = torch.from_numpy(np.asarray(z))
    x = x * torch.rsqrt(torch.mean(x.pow(2.0), dim=1, keepdim=True) + 1e-8)
    for i in range(1, 9):
        w = torch.from_numpy(state[f"block_{i}.fc.weight"])
        b = torch.from_numpy(state[f"block_{i}.fc.bias"])
        x = F.leaky_relu(F.linear(x, w, b), 0.2)
    ref = x.view(2, 1, latent).repeat(1, 6, 1)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_stylegan2_converter_structure(rng):
    """Converted tree slots into the flax model (init-compatible shapes)."""
    gen = StyleGAN2Generator(resolution=16, fmaps_base=64, fmaps_max=16)
    z = jnp.zeros((1, 512))
    variables = gen.init({"params": jax.random.PRNGKey(0)}, z)

    # build a reference-style state dict from our own shapes
    state = {}
    state["truncation.w_avg"] = rng.randn(512).astype(np.float32)
    for i, layer in variables["params"]["mapping"].items():
        state[f"mapping.{i}.weight"] = np.transpose(np.asarray(layer["weight"]))
        state[f"mapping.{i}.bias"] = np.asarray(layer["bias"])
    syn = variables["params"]["synthesis"]
    state["synthesis.early_layer.const"] = np.transpose(np.asarray(syn["const"]), (0, 3, 1, 2))
    for name, mod in syn.items():
        if name == "const":
            continue
        state[f"synthesis.{name}.weight"] = np.transpose(np.asarray(mod["weight"]), (3, 2, 0, 1))
        if "bias" in mod:
            state[f"synthesis.{name}.bias"] = np.asarray(mod["bias"])
        if "style" in mod:
            state[f"synthesis.{name}.style.weight"] = np.transpose(np.asarray(mod["style"]["weight"]))
            state[f"synthesis.{name}.style.bias"] = np.asarray(mod["style"]["bias"])
        if "noise_strength" in mod:
            state[f"synthesis.{name}.noise_strength"] = np.asarray(mod["noise_strength"])
    for name, mod in variables["buffers"]["synthesis"].items():
        state[f"synthesis.{name}.noise"] = np.transpose(np.asarray(mod["noise"]), (0, 3, 1, 2))

    converted = convert.stylegan2_generator(state)
    # identical structure and values round-trip
    flat_a = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    flat_b = jax.tree_util.tree_flatten_with_path(
        jax.tree.map(jnp.asarray, converted["params"])
    )[0]
    assert [p for p, _ in flat_a] == [p for p, _ in flat_b]
    for (pa, va), (pb, vb) in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb), atol=1e-6, err_msg=str(pa))

    out = gen.apply(converted, z)
    assert out["image"].shape == (1, 16, 16, 3)


def test_fold_spectral_norm(rng):
    lin = torch.nn.Linear(6, 4, bias=False)
    sn = torch.nn.utils.spectral_norm(lin, eps=1e-12)
    x = torch.randn(2, 6)
    sn.eval()
    with torch.no_grad():
        for _ in range(8):
            sn(x)  # converge u/v
        ref = sn(x).numpy()
    state = {k: v.detach().numpy() for k, v in sn.state_dict().items()}
    folded = convert.fold_spectral_norm({f"m.{k}": v for k, v in state.items()})
    w = folded["m.weight"]
    got = x.numpy() @ w.T
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_encoder_converter_roundtrip(rng):
    from tpugan.models.encoders import Encoder

    enc = Encoder(startf=4, maxf=16, layer_count=3, latent_size=8)
    x = jnp.zeros((1, 16, 16, 3))
    variables = enc.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, x)

    state = {}
    p = variables["params"]
    state["FromRGB.from_rgb.weight"] = np.transpose(np.asarray(p["from_rgb"]["kernel"]), (3, 2, 0, 1))
    state["FromRGB.from_rgb.bias"] = np.asarray(p["from_rgb"]["bias"])
    for i in range(3):
        blk = p[f"block_{i}"]
        src = f"decode_block.{i}."
        for nm in ("noise_weight_1", "bias_1"):
            state[src + nm] = np.asarray(blk[nm]).reshape(1, -1, 1, 1)
        if "noise_weight_2" in blk:
            state[src + "noise_weight_2"] = np.asarray(blk["noise_weight_2"]).reshape(1, -1, 1, 1)
            state[src + "bias_2"] = np.asarray(blk["bias_2"]).reshape(1, -1, 1, 1)
        for lin in ("inver_mod1", "inver_mod2"):
            state[src + lin + ".weight"] = np.transpose(np.asarray(blk[lin]["kernel"]))
            state[src + lin + ".bias"] = np.asarray(blk[lin]["bias"])
        state[src + "conv_1.weight"] = np.transpose(np.asarray(blk["conv_1"]["kernel"]), (3, 2, 0, 1))
        if "conv_2" in blk:
            state[src + "conv_2.weight"] = np.transpose(np.asarray(blk["conv_2"]["kernel"]), (3, 2, 0, 1))
        if "conv_3" in blk:
            state[src + "conv_3.weight"] = np.transpose(np.asarray(blk["conv_3"]["kernel"]), (3, 2, 0, 1))
            state[src + "conv_3.bias"] = np.asarray(blk["conv_3"]["bias"])

    converted = convert.encoder(state, layer_count=3)
    flat_a = jax.tree_util.tree_flatten_with_path(p)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(jax.tree.map(jnp.asarray, converted))[0]
    assert [q for q, _ in flat_a] == [q for q, _ in flat_b]
    for (qa, va), (qb, vb) in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb), atol=1e-6, err_msg=str(qa))
