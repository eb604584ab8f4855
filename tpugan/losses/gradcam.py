"""Grad-CAM / Grad-CAM++ / Guided Backprop — fully in-graph (jit-able).

TPU-native rebuild of metric/grad_cam.py. The reference registers
forward/backward hooks on torchvision VGG16's last conv and round-trips
every CAM through numpy + cv2 per iteration (SURVEY.md §3.2 calls this the
worst host/device churn in the codebase). Here the whole pipeline —
forward, majority-class pick, VJP through the classifier head, CAM++
alpha weighting, per-image min-max normalisation, bilinear resize,
JET colormap — is pure jax and fuses into the training step.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpugan.losses.vgg import VGG16


def majority_class(logits: jax.Array) -> jax.Array:
    """argmax per image, then the most frequent class across the batch
    (grad_cam.py:91-93: np.argmax(np.bincount(index)))."""
    idx = jnp.argmax(logits, axis=-1)
    counts = jnp.sum(jax.nn.one_hot(idx, logits.shape[-1]), axis=0)
    return jnp.argmax(counts)


def _normalize_resize(cam: jax.Array, height: int, width: int) -> jax.Array:
    """Per-image min-max normalise then bilinear resize to (height, width);
    returns [N, H, W, 1] (grad_cam.py:108-114, cv2.resize default)."""
    cmin = jnp.min(cam, axis=(1, 2), keepdims=True)
    cam = cam - cmin
    cmax = jnp.max(cam, axis=(1, 2), keepdims=True)
    cam = cam / jnp.where(cmax > 0, cmax, 1.0)
    cam = jax.image.resize(cam, (cam.shape[0], height, width), method="linear")
    return cam[..., None]


def grad_cam(
    vgg: VGG16,
    variables,
    images: jax.Array,
    index: Optional[jax.Array] = None,
    plus_plus: bool = False,
    guided: bool = True,
) -> jax.Array:
    """CAM masks [N, H, W, 1] in [0, 1] for NHWC images.

    ``plus_plus`` selects Grad-CAM++ alpha weighting (grad_cam.py:157-194);
    plain Grad-CAM (:82-115) otherwise. ``index=None`` uses the batch
    majority class like the reference.

    The feature map and its gradient are the last conv's PRE-ReLU output:
    the torch hooks sit on the Conv2d module itself (features.28,
    metric/grad_cam.py:42-47). ``guided=True`` (the default) also clamps
    every ReLU VJP on the backward: each of the three reference scripts
    that builds GradCamPlusPlus constructs GuidedBackPropagation on the
    SAME vgg16 instance (E_mis_align_cropping_s1.py:105-106,
    inferE.py:97-98, embedding_v2_BigGAN.py:56-57), whose module-wide ReLU
    backward hooks clamp the CAM backward too — that is the executed
    behaviour; ``guided=False`` gives the un-hooked GradCAM class alone.
    """
    net = vgg.clone(guided=True) if (guided and not vgg.guided) else vgg
    logits, _, feature = net.apply(variables, images, return_conv_out=True)
    cls = majority_class(logits) if index is None else index

    def target_fn(f):
        out = net.apply(variables, f, method=VGG16.head_from_conv)
        return jnp.mean(out[:, cls])

    gradient = jax.grad(target_fn)(feature)  # [N, h, w, C]

    if plus_plus:
        g = jnp.maximum(gradient, 0.0)
        norm = jnp.sum(g, axis=(1, 2), keepdims=True)  # [N,1,1,C]
        inv = jnp.where(norm > 0, 1.0 / jnp.where(norm > 0, norm, 1.0), 0.0)
        alpha = jnp.where(g > 0, 1.0, 0.0) * inv
        weight = jnp.sum(g * alpha, axis=(1, 2))  # [N, C]
        cam = jnp.sum(feature * weight[:, None, None, :], axis=-1)
        # CAM++ skips the ReLU (grad_cam.py:185 commented out)
    else:
        weight = jnp.mean(gradient, axis=(1, 2))  # [N, C]
        cam = jnp.sum(feature * weight[:, None, None, :], axis=-1)
        cam = jnp.maximum(cam, 0.0)

    return _normalize_resize(cam, images.shape[1], images.shape[2])


def guided_backprop(
    vgg_guided: VGG16, variables, images: jax.Array, index: Optional[jax.Array] = None
) -> jax.Array:
    """Input-gradient with guided (clamped) ReLU backward
    (grad_cam.py:196-232). Build ``vgg_guided`` with ``guided=True``."""

    def target_fn(x):
        logits, _ = vgg_guided.apply(variables, x)
        cls = majority_class(jax.lax.stop_gradient(logits)) if index is None else index
        return jnp.mean(logits[:, cls])

    return jax.grad(target_fn)(images)


# cv2.COLORMAP_JET, RGB order: the exact 256x3 uint8 table
# (cv2.applyColorMap(arange(256, uint8), COLORMAP_JET)[..., ::-1]), baked so
# the runtime needs no cv2 while mask2cam matches the reference bit-exactly.
_JET_HEX = (
    "00008000008400008800008c00009000009400009800009c0000a00000a40000"
    "a80000ac0000b00000b40000b80000bc0000c00000c40000c80000cc0000d000"
    "00d40000d80000dc0000e00000e40000e80000ec0000f00000f40000f80000fc"
    "0000ff0004ff0008ff000cff0010ff0014ff0018ff001cff0020ff0024ff0028"
    "ff002cff0030ff0034ff0038ff003cff0040ff0044ff0048ff004cff0050ff00"
    "54ff0058ff005cff0060ff0064ff0068ff006cff0070ff0074ff0078ff007cff"
    "0080ff0084ff0088ff008cff0090ff0094ff0098ff009cff00a0ff00a4ff00a8"
    "ff00acff00b0ff00b4ff00b8ff00bcff00c0ff00c4ff00c8ff00ccff00d0ff00"
    "d4ff00d8ff00dcff00e0ff00e4ff00e8ff00ecff00f0ff00f4ff00f8ff00fcff"
    "02fffe06fffa0afff60efff212ffee16ffea1affe61effe222ffde26ffda2aff"
    "d62effd232ffce36ffca3affc63effc242ffbe46ffba4affb64effb252ffae56"
    "ffaa5affa65effa262ff9e66ff9a6aff966eff9272ff8e76ff8a7aff867eff82"
    "82ff7e86ff7a8aff768eff7292ff6e96ff6a9aff669eff62a2ff5ea6ff5aaaff"
    "56aeff52b2ff4eb6ff4abaff46beff42c2ff3ec6ff3acaff36ceff32d2ff2ed6"
    "ff2adaff26deff22e2ff1ee6ff1aeaff16eeff12f2ff0ef6ff0afaff06feff01"
    "fffc00fff800fff400fff000ffec00ffe800ffe400ffe000ffdc00ffd800ffd4"
    "00ffd000ffcc00ffc800ffc400ffc000ffbc00ffb800ffb400ffb000ffac00ff"
    "a800ffa400ffa000ff9c00ff9800ff9400ff9000ff8c00ff8800ff8400ff8000"
    "ff7c00ff7800ff7400ff7000ff6c00ff6800ff6400ff6000ff5c00ff5800ff54"
    "00ff5000ff4c00ff4800ff4400ff4000ff3c00ff3800ff3400ff3000ff2c00ff"
    "2800ff2400ff2000ff1c00ff1800ff1400ff1000ff0c00ff0800ff0400ff0000"
    "fc0000f80000f40000f00000ec0000e80000e40000e00000dc0000d80000d400"
    "00d00000cc0000c80000c40000c00000bc0000b80000b40000b00000ac0000a8"
    "0000a40000a000009c00009800009400009000008c0000880000840000800000"
)
_JET_LUT = jnp.asarray(
    np.frombuffer(bytes.fromhex("".join(_JET_HEX)), dtype=np.uint8)
    .reshape(256, 3)
    .astype(np.float32)
    / 255.0
)


def jet_colormap(x: jax.Array) -> jax.Array:
    """cv2 COLORMAP_JET for values in [0, 1] -> RGB [.., 3] in [0, 1].

    Matches the reference's ``cv2.applyColorMap(np.uint8(255 * j),
    cv2.COLORMAP_JET)`` + BGR->RGB + /255 exactly (grad_cam.py:240-242),
    including the uint8 truncation of 255*x.
    """
    idx = (255.0 * x).astype(jnp.uint8)
    return _JET_LUT[idx]


def mask2cam(mask: jax.Array, imgs: jax.Array) -> tuple[jax.Array, jax.Array]:
    """CAM overlays (grad_cam.py:234-251): JET heatmap of the mask, plus
    heatmap + image normalised per image.

    mask: [N, H, W, 1]; imgs: [N, H, W, 3]. The reference's normalisation
    mutates the batch array sequentially (:249 reads the half-updated
    array); here the sane batch-global min is used — the overlays feed
    visual dumps and the Gcam auxiliary loss only. NB the reference's
    ``np.max(np.min(cam.copy()), 0)`` is NOT a clamp: the 0 is numpy's
    *axis* argument on a scalar, so it subtracts the true (possibly
    negative) minimum — batch-1 parity is exact
    (test_reference_parity.py::test_grad_cam_plus_plus_parity).
    """
    heatmap = jet_colormap(mask[..., 0])  # [N, H, W, 3]
    cam = heatmap + imgs
    gmin = jnp.min(cam)
    cam = cam - gmin
    cmax = jnp.max(cam, axis=(1, 2, 3), keepdims=True)
    cam = cam / jnp.where(cmax > 0, cmax, 1.0)
    return heatmap, cam
