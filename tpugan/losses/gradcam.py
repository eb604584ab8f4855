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

from tpugan.losses.vgg import LAST_CONV_FEATURE, VGG16


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
) -> jax.Array:
    """CAM masks [N, H, W, 1] in [0, 1] for NHWC images.

    ``plus_plus`` selects Grad-CAM++ alpha weighting (grad_cam.py:157-194);
    plain Grad-CAM (:82-115) otherwise. ``index=None`` uses the batch
    majority class like the reference.
    """
    logits, feats = vgg.apply(variables, images)
    feature = feats[LAST_CONV_FEATURE]
    cls = majority_class(logits) if index is None else index

    def target_fn(f):
        out = vgg.apply(variables, f, method=VGG16.head)
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


def jet_colormap(x: jax.Array) -> jax.Array:
    """Approximate cv2 COLORMAP_JET for values in [0, 1] -> RGB [.., 3].

    The classic jet ramp (blue -> cyan -> yellow -> red); cv2's LUT differs
    by at most a few grey levels, which only affects dumped visualisations.
    """
    r = jnp.clip(1.5 - jnp.abs(4.0 * x - 3.0), 0.0, 1.0)
    g = jnp.clip(1.5 - jnp.abs(4.0 * x - 2.0), 0.0, 1.0)
    b = jnp.clip(1.5 - jnp.abs(4.0 * x - 1.0), 0.0, 1.0)
    return jnp.stack([r, g, b], axis=-1)


def mask2cam(mask: jax.Array, imgs: jax.Array) -> tuple[jax.Array, jax.Array]:
    """CAM overlays (grad_cam.py:234-251): JET heatmap of the mask, plus
    heatmap + image normalised per image.

    mask: [N, H, W, 1]; imgs: [N, H, W, 3]. The reference's normalisation
    mutates the batch array sequentially (:249 reads the half-updated
    array); here the sane batch-global min is used — the overlays feed
    visual dumps and the Gcam auxiliary loss only.
    """
    heatmap = jet_colormap(mask[..., 0])  # [N, H, W, 3]
    cam = heatmap + imgs
    gmin = jnp.maximum(jnp.min(cam), 0.0)
    cam = cam - gmin
    cmax = jnp.max(cam, axis=(1, 2, 3), keepdims=True)
    cam = cam / jnp.where(cmax > 0, cmax, 1.0)
    return heatmap, cam
