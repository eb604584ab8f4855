"""VGG16 in flax (NHWC) — backbone for LPIPS and Grad-CAM.

The reference pulls ``torchvision.models.vgg16(pretrained=True)`` and hooks
its last conv layer for Grad-CAM (E_mis_align_cropping_s1.py:100-105,
metric/grad_cam.py:42-47). Here the architecture is implemented natively;
weights convert via ``tpugan.io.convert.vgg16``. The forward returns the
logits plus every post-ReLU feature map, and ``head`` continues from the
last conv activation to the logits — so Grad-CAM needs no hooks, it
differentiates ``head`` directly (tpugan.losses.gradcam).
"""

from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp

# channels per conv layer; 'M' = 2x2 max pool (torchvision 'D' config)
VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M"]

# post-ReLU feature indices used by LPIPS (relu1_2, 2_2, 3_3, 4_3, 5_3)
LPIPS_FEATURES = (1, 3, 6, 9, 12)

# index of the last conv's ReLU output (Grad-CAM target, features.28)
LAST_CONV_FEATURE = 12

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@jax.custom_vjp
def guided_relu(x):
    return jnp.maximum(x, 0.0)


def _guided_fwd(x):
    return jnp.maximum(x, 0.0), x


def _guided_bwd(x, g):
    # torch backward_hook: clamp(grad_in, min=0) == clamp(g, 0) * (x > 0)
    # (grad_cam.py:207-215)
    return (jnp.where(x > 0, jnp.maximum(g, 0.0), 0.0),)


guided_relu.defvjp(_guided_fwd, _guided_bwd)


def adaptive_avg_pool2d(x: jax.Array, out: int = 7) -> jax.Array:
    """torch F.adaptive_avg_pool2d semantics (variable window sizes)."""
    n, h, w, c = x.shape
    if h == out and w == out:
        return x

    def pool_axis(arr, size, axis):
        pieces = []
        for i in range(out):
            start = (i * size) // out
            end = -(-((i + 1) * size) // out)
            sl = [slice(None)] * arr.ndim
            sl[axis] = slice(start, end)
            pieces.append(jnp.mean(arr[tuple(sl)], axis=axis, keepdims=True))
        return jnp.concatenate(pieces, axis=axis)

    x = pool_axis(x, h, 1)
    x = pool_axis(x, w, 2)
    return x


class VGG16(nn.Module):
    """Returns (logits | None, features): features[j] is the j-th conv's
    post-ReLU activation (13 total). ``include_classifier=False`` builds
    the feature extractor only (LPIPS backbone). ``guided=True`` swaps in
    the guided-backprop ReLU (clamped gradient) everywhere."""

    include_classifier: bool = True
    num_classes: int = 1000
    guided: bool = False

    def _relu(self, x):
        return guided_relu(x) if self.guided else nn.relu(x)

    @nn.compact
    def __call__(self, x: jax.Array, return_conv_out: bool = False):
        feats = []
        conv_idx = 0
        conv_out = None
        for v in VGG16_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(v, (3, 3), padding=1, name=f"conv_{conv_idx}")(x)
                if conv_idx == LAST_CONV_FEATURE:
                    # pre-ReLU: what the torch forward hook on the Conv2d
                    # module itself (features.28) captures — Grad-CAM's
                    # feature map (metric/grad_cam.py:26-28)
                    conv_out = x
                x = self._relu(x)
                feats.append(x)
                conv_idx += 1
        logits = self.head(feats[LAST_CONV_FEATURE]) if self.include_classifier else None
        if return_conv_out:
            return logits, feats, conv_out
        return logits, feats

    def head_from_conv(self, conv_out: jax.Array) -> jax.Array:
        """Pre-ReLU last-conv output -> logits: the function Grad-CAM
        differentiates. The torch backward hook sits on the Conv2d module
        (features.28), so the captured gradient is taken BEFORE the
        features.29 ReLU (metric/grad_cam.py:30-47) — the backward passes
        through that ReLU (guided-clamped when GuidedBackPropagation has
        hooked the same net, E_mis_align_cropping_s1.py:105-106)."""
        return self.head(self._relu(conv_out))

    @nn.compact_name_scope
    def head(self, last_conv_feature: jax.Array) -> jax.Array:
        """Last conv activation -> logits (final max-pool + classifier).

        Shares parameters with __call__ (fc_0/1/2 names); this is the
        function Grad-CAM differentiates."""
        x = nn.max_pool(last_conv_feature, (2, 2), strides=(2, 2))
        x = adaptive_avg_pool2d(x, 7)
        x = x.reshape(x.shape[0], -1)
        x = self._relu(nn.Dense(4096, name="fc_0")(x))
        x = self._relu(nn.Dense(4096, name="fc_1")(x))
        return nn.Dense(self.num_classes, name="fc_2")(x)


def preprocess_imagenet(images: jax.Array) -> jax.Array:
    """[-1, 1] NHWC RGB -> ImageNet-normalized (the reference feeds
    generator output straight into VGG after this shift)."""
    x = images * 0.5 + 0.5
    mean = jnp.asarray(IMAGENET_MEAN, images.dtype)
    std = jnp.asarray(IMAGENET_STD, images.dtype)
    return (x - mean) / std
