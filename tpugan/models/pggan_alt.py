"""MSG/Pro-GAN alternative PGGAN stack — flax/NHWC.

Rebuild of /root/reference/model/pggan/utils/{CustomLayers, Networks,
Encoder}.py (the pro_gan_pytorch-style stack kept in the reference but
unused by the main scripts; SURVEY.md §2.1 row "PGGAN alt stack"):
  * equalized conv/deconv/linear (runtime sqrt(2/fan_in) scale)
  * GenInitialBlock / GenGeneralConvBlock / DisGeneralConvBlock /
    DisFinalBlock / ConDisFinalBlock (projection discriminator)
  * ``ProGANGenerator`` / ``ProGANDiscriminator`` /
    ``ConditionalProGANDiscriminator`` (Networks.py:11-258)
  * ``ProGANEncoder`` (Encoder.py:11-86, with its 4x4 conv z head) and
    ``SmallEncoder`` (Encoder.py:88-106)

All progressive ``depth``/``alpha`` arguments are static python values.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpugan.ops.basic import downscale2d, leaky_relu, pixel_norm, upscale2d


class EqlConv(nn.Module):
    """_equalized_conv2d (CustomLayers.py:8-38): randn weight, runtime
    sqrt(2/fan_in) scale, zero bias."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        cin = x.shape[-1]
        weight = self.param(
            "weight", nn.initializers.normal(stddev=1.0), (k, k, cin, self.features)
        )
        scale = math.sqrt(2.0) / math.sqrt(k * k * cin)
        y = jax.lax.conv_general_dilated(
            x, weight * scale,
            window_strides=(self.stride, self.stride),
            padding=((self.padding, self.padding),) * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y


class EqlDeconv(nn.Module):
    """_equalized_deconv2d (CustomLayers.py:40-77): fan_in = c_in."""

    features: int
    kernel_size: int = 4
    stride: int = 1
    padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        cin = x.shape[-1]
        weight = self.param(
            "weight", nn.initializers.normal(stddev=1.0), (k, k, cin, self.features)
        )
        scale = math.sqrt(2.0) / math.sqrt(cin)
        w = jnp.flip(weight * scale, axis=(0, 1))
        return jax.lax.conv_general_dilated(
            x, w,
            window_strides=(1, 1),
            padding=((k - 1 - self.padding,) * 2, (k - 1 - self.padding,) * 2),
            lhs_dilation=(self.stride, self.stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + (self.param("bias", nn.initializers.zeros, (self.features,)) if self.use_bias else 0.0)


def _mb_stddev(x, alpha=1e-8):
    """MinibatchStdDev (CustomLayers.py:203-225): one global scalar."""
    n, h, w, c = x.shape
    y = x - jnp.mean(x, axis=0, keepdims=True)
    y = jnp.sqrt(jnp.mean(jnp.square(y), axis=0) + alpha)
    y = jnp.mean(y)
    return jnp.concatenate([x, jnp.full((n, h, w, 1), y, x.dtype)], axis=-1)


class GenInitialBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, z):
        y = z[:, None, None, :]  # [N, 1, 1, latent]
        y = leaky_relu(EqlDeconv(self.features, 4, name="conv_1")(y), 0.2)
        y = leaky_relu(EqlConv(self.features, 3, padding=1, name="conv_2")(y), 0.2)
        return pixel_norm(y, axis=-1)


class GenGeneralConvBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        y = upscale2d(x)
        y = pixel_norm(leaky_relu(EqlConv(self.features, 3, padding=1, name="conv_1")(y), 0.2), axis=-1)
        y = pixel_norm(leaky_relu(EqlConv(self.features, 3, padding=1, name="conv_2")(y), 0.2), axis=-1)
        return y


class DisGeneralConvBlock(nn.Module):
    mid_features: int
    out_features: int

    @nn.compact
    def __call__(self, x):
        y = leaky_relu(EqlConv(self.mid_features, 3, padding=1, name="conv_1")(x), 0.2)
        y = leaky_relu(EqlConv(self.out_features, 3, padding=1, name="conv_2")(y), 0.2)
        return downscale2d(y)


class DisFinalBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        y = _mb_stddev(x)
        y = leaky_relu(EqlConv(self.features, 3, padding=1, name="conv_1")(y), 0.2)
        y = leaky_relu(EqlConv(self.features, 4, name="conv_2")(y), 0.2)
        y = EqlConv(1, 1, name="conv_3")(y)
        return y.reshape(-1)


class ConDisFinalBlock(nn.Module):
    """Projection discriminator final block (CustomLayers.py:297-348)."""

    features: int
    num_classes: int

    @nn.compact
    def __call__(self, x, labels):
        y = _mb_stddev(x)
        y = leaky_relu(EqlConv(self.features, 3, padding=1, name="conv_1")(y), 0.2)
        y = leaky_relu(EqlConv(self.features, 4, name="conv_2")(y), 0.2)
        emb = nn.Embed(self.num_classes, self.features, name="label_embedder")(labels)
        # torch Embedding(max_norm=1): renormalise rows above unit norm
        norm = jnp.linalg.norm(emb, axis=-1, keepdims=True)
        emb = emb / jnp.maximum(norm, 1.0)
        y_flat = y.reshape(y.shape[0], -1)
        projection = jnp.sum(y_flat * emb, axis=-1)
        score = leaky_relu(EqlConv(1, 1, name="conv_3")(y), 0.2)
        return score.reshape(-1) + projection


def _gen_channels(depth, latent, i):
    return latent if i <= 2 else latent // (2 ** (i - 2))


class ProGANGenerator(nn.Module):
    """Networks.Generator (:11-80): progressive depth/alpha fade-in."""

    depth: int = 7
    latent_size: int = 512

    @nn.compact
    def __call__(self, z, depth: Optional[int] = None, alpha: float = 1.0):
        depth = self.depth - 1 if depth is None else depth
        assert depth < self.depth
        y = GenInitialBlock(self.latent_size, name="initial_block")(z)

        # run the full ladder so every block/ToRGB materialises at init
        # (the reference builds all modules in __init__); XLA dead-code-
        # eliminates the levels above ``depth``
        feats = [y]
        for i in range(self.depth - 1):
            out_ch = (
                self.latent_size if i <= 2 else self.latent_size // (2 ** (i - 2))
            )
            feats.append(GenGeneralConvBlock(out_ch, name=f"layer_{i}")(feats[-1]))
        rgb_convs = [EqlConv(3, 1, name=f"rgb_{i}") for i in range(self.depth)]
        rgbs = [conv(f) for conv, f in zip(rgb_convs, feats)]

        if depth > 0:
            # fade-in reuses the previous level's ToRGB on the upsampled
            # features (Networks.py:70-72)
            residual = rgb_convs[depth - 1](upscale2d(feats[depth - 1]))
            return alpha * rgbs[depth] + (1 - alpha) * residual
        return rgbs[0]


def _dis_ladder(x, height, alpha, max_height, feature_size):
    """Shared discriminator/encoder ladder (Networks.py:123-168): every
    from_rgb head and block materialises (applied to an image pyramid so
    init sees all params; unused levels are dead-code-eliminated)."""

    # rgb_to_features[j] output channels (Networks.py:104-121: head j feeds
    # layer j-1, whose input is feature_size//2^(j-3) once j > 3)
    def rch(j):
        return feature_size if j <= 3 else feature_size // (2 ** (j - 3))

    from_rgb = [EqlConv(rch(j), 1, name=f"from_rgb_{j}") for j in range(max_height)]
    layers = []
    for i in range(max_height - 1):
        if i > 2:
            layers.append(
                DisGeneralConvBlock(
                    feature_size // (2 ** (i - 2)),
                    feature_size // (2 ** (i - 3)),
                    name=f"layer_{i}",
                )
            )
        else:
            layers.append(
                DisGeneralConvBlock(feature_size, feature_size, name=f"layer_{i}")
            )

    # materialise every head/block against a pyramid of the input
    pyramid = [x]
    for _ in range(max_height - 1):
        pyramid.append(downscale2d(pyramid[-1]))
    heads = [
        conv(pyramid[height - i if 0 <= height - i < len(pyramid) else 0])
        for i, conv in enumerate(from_rgb)
    ]
    for i, layer in enumerate(layers):
        layer(heads[i + 1] if i + 1 < len(heads) else heads[-1])

    if height > 0:
        residual = from_rgb[height - 1](downscale2d(x))
        straight = layers[height - 1](from_rgb[height](x))
        y = alpha * straight + (1 - alpha) * residual
        for i in reversed(range(height - 1)):
            y = layers[i](y)
    else:
        y = from_rgb[0](x)
    return y


class ProGANDiscriminator(nn.Module):
    """Networks.Discriminator (:83-168)."""

    height: int = 7
    feature_size: int = 512
    conditional: bool = False
    num_classes: int = 0

    @nn.compact
    def __call__(self, x, height: Optional[int] = None, alpha: float = 1.0, labels=None):
        height = self.height - 1 if height is None else height
        assert height < self.height
        y = _dis_ladder(x, height, alpha, self.height, self.feature_size)
        if self.conditional:
            return ConDisFinalBlock(self.feature_size, self.num_classes, name="final_block")(y, labels)
        return DisFinalBlock(self.feature_size, name="final_block")(y)


class ProGANEncoder(nn.Module):
    """Encoder.encoder (Encoder.py:11-86): the discriminator ladder with
    the final block replaced by a 4x4 conv head to a 512-d code."""

    height: int = 7
    feature_size: int = 512

    @nn.compact
    def __call__(self, x, depth: Optional[int] = None, alpha: float = 1.0):
        depth = self.height - 1 if depth is None else depth
        assert depth < self.height
        y = _dis_ladder(x, depth, alpha, self.height, self.feature_size)
        # new_final: plain Conv2d(512, 512, 4) (Encoder.py:59) -> [N, latent]
        z = nn.Conv(self.feature_size, (4, 4), padding="VALID", name="new_final")(y)
        return z.reshape(z.shape[0], self.feature_size)


class SmallEncoder(nn.Module):
    """encoder_small (Encoder.py:88-106): tiny strided-conv 1024 -> z[512]."""

    @nn.compact
    def __call__(self, x):
        y = leaky_relu(nn.Conv(12, (4, 4), strides=2, padding=1, use_bias=False, name="conv_0")(x), 0.2)
        y = nn.Conv(12, (4, 4), strides=2, padding=1, use_bias=False, name="conv_1")(y)
        y = leaky_relu(nn.BatchNorm(use_running_average=True, name="bn_1")(y), 0.2)
        y = nn.Conv(3, (4, 4), strides=2, padding=1, use_bias=False, name="conv_2")(y)
        y = leaky_relu(nn.BatchNorm(use_running_average=True, name="bn_2")(y), 0.2)
        y = nn.Conv(1, (4, 4), strides=2, padding=1, use_bias=False, name="conv_3")(y)
        y = y.reshape(y.shape[0], -1)
        return nn.Dense(512, name="fc")(y)
