"""Checkpoint converters: reference torch state dicts -> tpugan pytrees.

Covers the reference's four external checkpoint formats (SURVEY.md §5):
  * StyleGANv1 3-file format: Gs_dict.pth / Gm_dict.pth / center_tensor.pt
    (readme.md:67-71, loaded at E_align_cropping_s1.py:30-35)
  * StyleGAN2 / PGGAN single .pth with 'generator_smooth' | 'generator'
    keys (E_align_cropping_s1.py:52-55, 70-74)
  * BigGAN .pt + config JSON (:82-84), spectral norm folded
  * torchvision VGG16 / official LPIPS state dicts (for the perceptual
    loss and Grad-CAM attention stacks)
  * trained encoder E state dicts (model/E/*.py)

Layout rules (torch NCHW -> flax NHWC):
  conv  [out, in, kh, kw]        -> kernel [kh, kw, in, out]
  convT [in, out, kh, kw]        -> kernel [kh, kw, in, out]
  linear [out, in]               -> kernel [in, out]
  per-channel [1, C, 1, 1]       -> [C]
  dense following an NCHW flatten gets its input rows permuted to the
  NHWC flatten order (``_permute_flatten_rows``).

All converters are pure dict -> pytree transforms over numpy arrays; use
``load_torch_state_dict`` to read the .pth/.pt files.
"""

from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np


def load_torch_state_dict(path) -> Dict[str, np.ndarray]:
    """Read a torch checkpoint into a flat {name: numpy} dict (CPU)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and any(
        hasattr(v, "detach") for v in obj.values()
    ):
        state = obj
    elif hasattr(obj, "state_dict"):
        state = obj.state_dict()
    else:
        state = obj
    return {k: _np(v) for k, v in state.items()}


def _np(v):
    if hasattr(v, "detach"):
        return v.detach().cpu().numpy()
    return np.asarray(v)


def conv_w(w):
    """[out, in, kh, kw] -> [kh, kw, in, out]."""
    return np.transpose(w, (2, 3, 1, 0))


def convT_w(w):
    """[in, out, kh, kw] -> [kh, kw, in, out]."""
    return np.transpose(w, (2, 3, 0, 1))


def linear_w(w):
    """[out, in] -> [in, out]."""
    return np.transpose(w)


def chan(w):
    """[1, C, 1, 1] (or [C]) -> [C]."""
    return np.reshape(w, (-1,))


def nchw_const(w):
    """[1, C, H, W] -> [1, H, W, C]."""
    return np.transpose(w, (0, 2, 3, 1))


def _permute_flatten_rows(w, channels: int, height: int, width: int):
    """Reorder a dense kernel's input rows from an NCHW flatten to NHWC.

    ``w`` is already [in, out] with in = C*H*W in torch (channel-major)
    order; returns rows ordered H, W, C (our flatten order).
    """
    w = w.reshape(channels, height, width, -1)
    w = np.transpose(w, (1, 2, 0, 3))
    return w.reshape(channels * height * width, -1)


def fold_spectral_norm(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Fold torch spectral_norm triplets (weight_orig/_u/_v) into plain
    ``weight`` entries (eval semantics: sigma = u . (W_mat @ v))."""
    out: Dict[str, np.ndarray] = {}
    for k, v in state.items():
        if k.endswith("weight_orig"):
            base = k[: -len("_orig")]
            u = state.get(base + "_u")
            vv = state.get(base + "_v")
            w_mat = v.reshape(v.shape[0], -1)
            if u is None:
                u = np.random.RandomState(0).randn(w_mat.shape[0]).astype(v.dtype)
                for _ in range(20):
                    vv = w_mat.T @ u
                    vv /= np.linalg.norm(vv) + 1e-12
                    u = w_mat @ vv
                    u /= np.linalg.norm(u) + 1e-12
            elif vv is None:
                vv = w_mat.T @ u
                vv /= np.linalg.norm(vv) + 1e-12
            sigma = float(u @ (w_mat @ vv))
            out[base] = v / sigma
        elif k.endswith("weight_u") or k.endswith("weight_v"):
            continue
        else:
            out[k] = v
    return out


# ---------------------------------------------------------------------------
# StyleGANv1 (model/stylegan1/net.py)
# ---------------------------------------------------------------------------


def stylegan1_generator(state: Dict[str, np.ndarray], layer_count: int) -> Dict[str, Any]:
    """Gs_dict.pth -> StyleGANv1Generator params."""
    p: Dict[str, Any] = {"const": nchw_const(state["const"])}
    for i in range(layer_count):
        src = f"decode_block.{i}."
        blk: Dict[str, Any] = {
            "noise_weight_1": chan(state[src + "noise_weight_1"]),
            "noise_weight_2": chan(state[src + "noise_weight_2"]),
            "bias_1": chan(state[src + "bias_1"]),
            "bias_2": chan(state[src + "bias_2"]),
            "style_1": {
                "kernel": linear_w(state[src + "style_1.weight"]),
                "bias": state[src + "style_1.bias"],
            },
            "style_2": {
                "kernel": linear_w(state[src + "style_2.weight"]),
                "bias": state[src + "style_2.bias"],
            },
            "conv_2": {"kernel": conv_w(state[src + "conv_2.weight"])},
        }
        if src + "conv_1.weight" in state:
            w = state[src + "conv_1.weight"]
            # fused (transpose) convs store [in, out, kh, kw]; plain convs
            # [out, in, kh, kw]. Fused when the block's output resolution
            # 4*2^i reaches 128 (net.py:285).
            fused = (4 * 2**i) >= 128
            blk["conv_1"] = {"kernel": convT_w(w) if fused else conv_w(w)}
        p[f"decode_block_{i}"] = blk
        p[f"to_rgb_{i}"] = {
            "to_rgb": {
                "kernel": conv_w(state[f"to_rgb.{i}.to_rgb.weight"]),
                "bias": state[f"to_rgb.{i}.to_rgb.bias"],
            }
        }
    return p


def stylegan1_mapping(state: Dict[str, np.ndarray], mapping_layers: int = 8) -> Dict[str, Any]:
    """Gm_dict.pth -> StyleGANv1Mapping params (buffer1 handled separately
    via ``center_tensor`` below)."""
    p: Dict[str, Any] = {}
    for i in range(1, mapping_layers + 1):
        p[f"block_{i}"] = {
            "fc": {
                "kernel": linear_w(state[f"block_{i}.fc.weight"]),
                "bias": state[f"block_{i}.fc.bias"],
            }
        }
    return p


def center_tensor(path) -> np.ndarray:
    """center_tensor.pt -> [num_layers, latent] truncation center."""
    import torch

    t = torch.load(path, map_location="cpu", weights_only=False)
    t = _np(t)
    return t.reshape(t.shape[-2], t.shape[-1])


# ---------------------------------------------------------------------------
# StyleGANv2 (model/stylegan2_generator.py)
# ---------------------------------------------------------------------------


def stylegan2_generator(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """state_dict['generator_smooth'|'generator'] -> {'params', 'buffers'}."""
    params: Dict[str, Any] = {"mapping": {}, "synthesis": {}}
    buffers: Dict[str, Any] = {"truncation": {"w_avg": state["truncation.w_avg"]}, "synthesis": {}}

    for k, v in state.items():
        if k.startswith("mapping.dense"):
            m = re.match(r"mapping\.(dense\d+)\.(weight|bias)", k)
            name, kind = m.group(1), m.group(2)
            params["mapping"].setdefault(name, {})[kind] = (
                linear_w(v) if kind == "weight" else v
            )
        elif k == "mapping.label_weight":
            params["mapping"]["label_weight"] = v
        elif k == "synthesis.early_layer.const":
            params["synthesis"]["const"] = nchw_const(v)
        elif m := re.match(r"synthesis\.(layer\d+|output\d+|skip_layer\d+)\.(.*)", k):
            name, rest = m.group(1), m.group(2)
            dst = params["synthesis"].setdefault(name, {})
            if rest == "weight":
                dst["weight"] = conv_w(v)
            elif rest == "bias":
                dst["bias"] = v
            elif rest == "style.weight":
                dst.setdefault("style", {})["weight"] = linear_w(v)
            elif rest == "style.bias":
                dst.setdefault("style", {})["bias"] = v
            elif rest == "noise_strength":
                dst["noise_strength"] = v.reshape(())
            elif rest == "noise":
                buffers["synthesis"].setdefault(name, {})["noise"] = nchw_const(v)
    return {"params": params, "buffers": buffers}


# ---------------------------------------------------------------------------
# PGGAN (model/pggan/pggan_generator.py)
# ---------------------------------------------------------------------------


def pggan_generator(state: Dict[str, np.ndarray], fused_scale: bool = False) -> Dict[str, Any]:
    params: Dict[str, Any] = {}
    for k, v in state.items():
        m = re.match(r"(layer\d+|output\d+)\.(weight|bias)", k)
        if not m:
            continue  # 'lod' buffer is a runtime arg here
        name, kind = m.group(1), m.group(2)
        dst = params.setdefault(name, {})
        if kind == "bias":
            dst["bias"] = v
        else:
            # fused up-convs store [in, out, kh, kw]
            idx = int(name.replace("layer", "")) if name.startswith("layer") else -1
            is_up_fused = (
                fused_scale and name.startswith("layer") and idx >= 2 and idx % 2 == 0
            )
            dst["weight"] = convT_w(v) if is_up_fused else conv_w(v)
    return params


# ---------------------------------------------------------------------------
# BigGAN (model/biggan_generator.py)
# ---------------------------------------------------------------------------


def biggan(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """G-256.pt (spectral-norm) -> {'params', 'buffers'} for tpugan BigGAN."""
    state = fold_spectral_norm(state)
    params: Dict[str, Any] = {"generator": {}}
    buffers: Dict[str, Any] = {"generator": {}}

    def put(tree, path, leaf):
        for part in path[:-1]:
            tree = tree.setdefault(part, {})
        tree[path[-1]] = leaf

    for k, v in state.items():
        parts = k.split(".")
        if k == "embeddings.weight":
            params["embeddings"] = {"kernel": linear_w(v)}
            continue
        assert parts[0] == "generator", k
        parts = parts[1:]
        # generator.layers.N.* -> layers_N/*
        if parts[0] == "layers":
            parts = [f"layers_{parts[1]}"] + parts[2:]
        name = parts[-1]
        mod = parts[:-1]
        if name == "weight":
            if v.ndim == 4:
                put(params["generator"], mod + ["kernel"], conv_w(v))
            elif v.ndim == 2:
                put(params["generator"], mod + ["kernel"], linear_w(v))
            else:  # unconditional BN weight
                put(params["generator"], mod + ["weight"], v)
        elif name == "bias":
            put(params["generator"], mod + ["bias"], v)
        elif name == "gamma":
            put(params["generator"], mod + ["gamma"], v.reshape(-1))
        elif name in ("running_means", "running_vars"):
            put(buffers["generator"], mod + [name], v)
        else:
            put(params["generator"], mod + [name], v)
    # the final unconditional bn stores weight/bias as params (ndim 1):
    bn = params["generator"].get("bn")
    if bn is not None and "kernel" in bn:
        bn["weight"] = bn.pop("kernel")
    return {"params": params, "buffers": buffers}


# ---------------------------------------------------------------------------
# Encoders (model/E/*.py)
# ---------------------------------------------------------------------------


def encoder(state: Dict[str, np.ndarray], layer_count: int) -> Dict[str, Any]:
    """E/E_Blur state dict -> tpugan Encoder params."""
    p: Dict[str, Any] = {
        "from_rgb": {
            "kernel": conv_w(state["FromRGB.from_rgb.weight"]),
            "bias": state["FromRGB.from_rgb.bias"],
        }
    }
    for i in range(layer_count):
        src = f"decode_block.{i}."
        blk: Dict[str, Any] = {}
        for torch_name, ours in [
            ("noise_weight_1", "noise_weight_1"),
            ("noise_weight_2", "noise_weight_2"),
            ("bias_1", "bias_1"),
            ("bias_2", "bias_2"),
        ]:
            if src + torch_name in state:
                blk[ours] = chan(state[src + torch_name])
        for lin in ("inver_mod1", "inver_mod2"):
            if src + lin + ".weight" in state:
                blk[lin] = {
                    "kernel": linear_w(state[src + lin + ".weight"]),
                    "bias": state[src + lin + ".bias"],
                }
        blk["conv_1"] = {"kernel": conv_w(state[src + "conv_1.weight"])}
        if src + "conv_2.weight" in state:
            blk["conv_2"] = {"kernel": conv_w(state[src + "conv_2.weight"])}
        if src + "conv_3.weight" in state:
            blk["conv_3"] = {
                "kernel": conv_w(state[src + "conv_3.weight"]),
                "bias": state[src + "conv_3.bias"],
            }
        if src + "instance_norm_3.weight" in state:
            # E_v1's residual path has an affine IN after conv_3
            # (Ablation_Study/E_v1.py:61-62)
            blk["in3_scale"] = state[src + "instance_norm_3.weight"]
            blk["in3_bias"] = state[src + "instance_norm_3.bias"]
        p[f"block_{i}"] = blk
    if "out_z.weight" in state:
        # E_Blur_Z z head (Ablation_Study/E_Blur_Z.py:102 ln.Conv2d(512,512,3,2))
        p["out_z"] = {
            "kernel": conv_w(state["out_z.weight"]),
            "bias": state["out_z.bias"],
        }
    return p


def pg_encoder(state: Dict[str, np.ndarray], layer_count: int, maxf: int = 512) -> Dict[str, Any]:
    """E_PG state dict (model/E/E_PG.py BE) -> tpugan PGEncoder params.

    ``new_final`` follows the NCHW flatten of the final [maxf, 4, 4]
    features, so its input rows are permuted to the NHWC flatten order.
    """
    p: Dict[str, Any] = {
        "from_rgb": {
            "kernel": conv_w(state["FromRGB.from_rgb.weight"]),
            "bias": state["FromRGB.from_rgb.bias"],
        }
    }
    for i in range(layer_count):
        src = f"decode_block.{i}."
        blk: Dict[str, Any] = {
            "noise_weight_1": chan(state[src + "noise_weight_1"]),
            "bias_1": chan(state[src + "bias_1"]),
            "conv_1": {"kernel": conv_w(state[src + "conv_1.weight"])},
        }
        if src + "conv_2.weight" in state:
            blk["noise_weight_2"] = chan(state[src + "noise_weight_2"])
            blk["bias_2"] = chan(state[src + "bias_2"])
            blk["conv_2"] = {"kernel": conv_w(state[src + "conv_2.weight"])}
        if src + "conv_3.weight" in state:
            blk["conv_3"] = {
                "kernel": conv_w(state[src + "conv_3.weight"]),
                "bias": state[src + "conv_3.bias"],
            }
            # affine instance_norm_3 (E_PG.py:67)
            blk["in3_scale"] = state[src + "instance_norm_3.weight"]
            blk["in3_bias"] = state[src + "instance_norm_3.bias"]
        p[f"block_{i}"] = blk
    p["new_final"] = {
        "kernel": _permute_flatten_rows(linear_w(state["new_final.weight"]), maxf, 4, 4),
        "bias": state["new_final.bias"],
    }
    return p


def biggan_encoder(
    state: Dict[str, np.ndarray], layer_count: int, maxf: int = 512
) -> Dict[str, Any]:
    """E_BIG state dict (model/E/E_BIG.py BE) -> {'params', 'buffers', 'sn'}.

    The conditional batch norms keep *live* spectral norm; torch's stored
    ``weight_u``/``weight_v`` buffers transfer directly into the ``sn``
    collection (SNDense implements torch's exact train/eval semantics).
    """
    params: Dict[str, Any] = {
        "from_rgb": {
            "kernel": conv_w(state["FromRGB.from_rgb.weight"]),
            "bias": state["FromRGB.from_rgb.bias"],
        }
    }
    buffers: Dict[str, Any] = {}
    sn: Dict[str, Any] = {}
    for i in range(layer_count):
        src = f"decode_block.{i}."
        blk: Dict[str, Any] = {
            "noise_weight_1": chan(state[src + "noise_weight_1"]),
            "bias_1": chan(state[src + "bias_1"]),
            "conv_1": {"kernel": conv_w(state[src + "conv_1.weight"])},
        }
        bblk: Dict[str, Any] = {}
        sblk: Dict[str, Any] = {}
        for bn in ("batch_norm_1", "batch_norm_2", "batch_norm_3"):
            if src + bn + ".running_means" not in state:
                continue
            bblk[bn] = {
                "running_means": state[src + bn + ".running_means"],
                "running_vars": state[src + bn + ".running_vars"],
            }
            blk[bn] = {}
            sblk[bn] = {}
            for lin in ("scale", "offset"):
                blk[bn][lin] = {
                    "kernel": linear_w(state[f"{src}{bn}.{lin}.weight_orig"])
                }
                sblk[bn][lin] = {
                    "u": state[f"{src}{bn}.{lin}.weight_u"],
                    "v": state[f"{src}{bn}.{lin}.weight_v"],
                }
        if src + "conv_2.weight" in state:
            blk["noise_weight_2"] = chan(state[src + "noise_weight_2"])
            blk["bias_2"] = chan(state[src + "bias_2"])
            blk["conv_2"] = {"kernel": conv_w(state[src + "conv_2.weight"])}
        if src + "conv_3.weight" in state:
            blk["conv_3"] = {
                "kernel": conv_w(state[src + "conv_3.weight"]),
                "bias": state[src + "conv_3.bias"],
            }
        params[f"block_{i}"] = blk
        buffers[f"block_{i}"] = bblk
        sn[f"block_{i}"] = sblk
    params["new_final_1"] = {
        "kernel": _permute_flatten_rows(linear_w(state["new_final_1.weight"]), maxf, 4, 4),
        "bias": state["new_final_1.bias"],
    }
    params["new_final_2"] = {
        "kernel": linear_w(state["new_final_2.weight"]),
        "bias": state["new_final_2.bias"],
    }
    return {"params": params, "buffers": buffers, "sn": sn}


# ---------------------------------------------------------------------------
# VGG16 / LPIPS
# ---------------------------------------------------------------------------

_VGG16_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]


def vgg16(state: Dict[str, np.ndarray], include_classifier: bool = True) -> Dict[str, Any]:
    """torchvision VGG16 state dict -> tpugan.losses.vgg.VGG16 params."""
    p: Dict[str, Any] = {}
    for j, idx in enumerate(_VGG16_CONV_IDX):
        p[f"conv_{j}"] = {
            "kernel": conv_w(state[f"features.{idx}.weight"]),
            "bias": state[f"features.{idx}.bias"],
        }
    if include_classifier and "classifier.0.weight" in state:
        # classifier.0 follows the NCHW flatten of [512, 7, 7]; the
        # classifier lives under the VGG16.head name scope
        w0 = linear_w(state["classifier.0.weight"])
        p["head"] = {
            "fc_0": {
                "kernel": _permute_flatten_rows(w0, 512, 7, 7),
                "bias": state["classifier.0.bias"],
            },
            "fc_1": {
                "kernel": linear_w(state["classifier.3.weight"]),
                "bias": state["classifier.3.bias"],
            },
            "fc_2": {
                "kernel": linear_w(state["classifier.6.weight"]),
                "bias": state["classifier.6.bias"],
            },
        }
    return p


def lpips_vgg(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Official lpips (net='vgg') state dict -> tpugan LPIPS params.

    The lpips package stores the VGG backbone under ``net.slice{1..5}.*``
    (torchvision feature indices preserved) and the linear heads under
    ``lin{0..4}.model.1.weight`` ([1, C, 1, 1] convs).
    """
    p: Dict[str, Any] = {"backbone": {}}
    conv_map = {}
    for j, idx in enumerate(_VGG16_CONV_IDX):
        conv_map[idx] = f"conv_{j}"
    for k, v in state.items():
        m = re.match(r"(?:net\.)?slice\d+\.(\d+)\.(weight|bias)", k)
        if m:
            idx, kind = int(m.group(1)), m.group(2)
            name = conv_map[idx]
            dst = p["backbone"].setdefault(name, {})
            dst["kernel" if kind == "weight" else "bias"] = (
                conv_w(v) if kind == "weight" else v
            )
            continue
        m = re.match(r"lin(\d)\.model\.1\.weight", k)
        if m:
            p[f"lin_{m.group(1)}"] = {"kernel": conv_w(v)}
    return p
