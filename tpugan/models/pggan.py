"""PGGAN (GenForce-style) generator and discriminator — flax/NHWC.

TPU-native rebuild of /root/reference/model/pggan/pggan_generator.py and
pggan_discriminator.py:
  * ``PGGANGenerator``     <- PGGANGenerator (:28-204): pixel-norm z, the
    4x4 "Dense" conv (k=4, p=3 on a 1x1 input), per-resolution conv pairs,
    per-resolution ToRGB heads, progressive ``lod`` with alpha blending.
  * ``PGGANDiscriminator`` <- PGGANDiscriminator (:28-203): FromRGB ladder,
    conv pairs with optional fused stride-2, minibatch-std final block.

``lod`` is a static python float here (each level compiles to its own XLA
program — progressive inference is a handful of shapes, and static shapes
keep the MXU tiling clean). The reference's stray debug print
(pggan_generator.py:196) is intentionally not reproduced.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpugan.ops.basic import (
    downscale2d,
    leaky_relu,
    minibatch_stddev,
    pixel_norm,
    upscale2d,
)
from tpugan.ops.eq_lr import transform_kernel_2d

_WSCALE_GAIN = math.sqrt(2.0)
_INIT_RES = 4


class PGConvBlock(nn.Module):
    """Generator ConvBlock (pggan_generator.py:236-339): pixel_norm ->
    (upsample | fused transpose) -> wscale conv -> (l)relu."""

    in_channels: int
    out_channels: int
    kernel_size: int = 3
    padding: int = 1
    upsample: bool = False
    fused_scale: bool = False
    wscale_gain: float = _WSCALE_GAIN
    activation_type: str = "lrelu"

    @nn.compact
    def __call__(self, x):
        x = pixel_norm(x, axis=-1)
        k = self.kernel_size
        fan_in = k * k * self.in_channels
        wscale = self.wscale_gain / math.sqrt(fan_in)
        weight = self.param(
            "weight", nn.initializers.normal(stddev=1.0),
            (k, k, self.in_channels, self.out_channels),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        w = weight * wscale

        if self.upsample and self.fused_scale:
            # transform-kernel conv_transpose(k=3,s=2,p=1) (:323-331); torch
            # conv_transpose flips internally -> lhs-dilated conv with
            # flipped taps (matches tpugan.nn.layers.EqConv transpose path)
            w = transform_kernel_2d(w, average=False)
            kk = k + 1
            w = jnp.flip(w, axis=(0, 1))
            x = jax.lax.conv_general_dilated(
                x, w,
                window_strides=(1, 1),
                padding=((kk - 2, kk - 2), (kk - 2, kk - 2)),
                lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        else:
            if self.upsample:
                x = upscale2d(x)
            x = jax.lax.conv_general_dilated(
                x, w,
                window_strides=(1, 1),
                padding=((self.padding, self.padding),) * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        x = x + bias
        if self.activation_type == "lrelu":
            x = leaky_relu(x, 0.2)
        return x


class PGGANGenerator(nn.Module):
    """z [N, z_dim] -> dict(z, label, image) at static ``lod``."""

    resolution: int
    z_space_dim: int = 512
    image_channels: int = 3
    final_tanh: bool = False
    label_size: int = 0
    fused_scale: bool = False
    fmaps_base: int = 16 << 10
    fmaps_max: int = 512

    def get_nf(self, res):
        return min(self.fmaps_base // res, self.fmaps_max)

    @property
    def final_res_log2(self):
        return int(math.log2(self.resolution))

    @nn.compact
    def __call__(self, z, label=None, lod: float = 0.0):
        if z.ndim != 2 or z.shape[1] != self.z_space_dim:
            raise ValueError(
                f"latent code must be [batch, {self.z_space_dim}], got {z.shape}"
            )
        init_log2 = int(math.log2(_INIT_RES))
        final_log2 = self.final_res_log2
        if lod + init_log2 > final_log2:
            raise ValueError(f"maximum lod is {final_log2 - init_log2}, got {lod}")

        z = pixel_norm(z, axis=-1)
        if self.label_size:
            if label is None:
                raise ValueError(f"model requires a label of size {self.label_size}")
            z = jnp.concatenate([z, label], axis=1)

        x = z.reshape(z.shape[0], 1, 1, -1)
        image = None
        for res_log2 in range(init_log2, final_log2 + 1):
            res = 2**res_log2
            current_lod = final_log2 - res_log2
            block_idx = res_log2 - init_log2
            if lod < current_lod + 1:
                if res == _INIT_RES:
                    x = PGConvBlock(
                        in_channels=self.z_space_dim + self.label_size,
                        out_channels=self.get_nf(res),
                        kernel_size=_INIT_RES,
                        padding=_INIT_RES - 1,
                        name=f"layer{2 * block_idx}",
                    )(x)
                else:
                    x = PGConvBlock(
                        in_channels=self.get_nf(res // 2),
                        out_channels=self.get_nf(res),
                        upsample=True,
                        fused_scale=self.fused_scale,
                        name=f"layer{2 * block_idx}",
                    )(x)
                x = PGConvBlock(
                    in_channels=self.get_nf(res),
                    out_channels=self.get_nf(res),
                    name=f"layer{2 * block_idx + 1}",
                )(x)

            # The reference instantiates every ToRGB head in __init__; here
            # every reachable head is called so its params materialise at
            # init — XLA dead-code-eliminates the unused ones per lod.
            rgb = self._to_rgb(block_idx, res)(x) if lod < current_lod + 1 else None
            if current_lod - 1 < lod <= current_lod:
                image = rgb
            elif current_lod < lod < current_lod + 1:
                alpha = math.ceil(lod) - lod
                image = rgb * alpha + upscale2d(image) * (1 - alpha)
            elif lod >= current_lod + 1:
                image = upscale2d(image)

        if self.final_tanh:
            image = jnp.tanh(image)
        return {"z": z, "label": label, "image": image}

    def _to_rgb(self, block_idx, res):
        return PGConvBlock(
            in_channels=self.get_nf(res),
            out_channels=self.image_channels,
            kernel_size=1,
            padding=0,
            wscale_gain=1.0,
            activation_type="linear",
            name=f"output{block_idx}",
        )


class PGDConvBlock(nn.Module):
    """Discriminator ConvBlock (pggan_discriminator.py:246-...): optional
    minibatch-std, wscale conv (fused stride-2 with averaged 4-tap kernel),
    lrelu, optional avg-pool downsample."""

    in_channels: int
    out_channels: int
    kernel_size: int = 3
    padding: int = 1
    downsample: bool = False
    fused_scale: bool = False
    wscale_gain: float = _WSCALE_GAIN
    activation_type: str = "lrelu"
    minibatch_std_group_size: int = 0

    @nn.compact
    def __call__(self, x):
        cin = self.in_channels
        if self.minibatch_std_group_size > 1:
            x = minibatch_stddev(x, self.minibatch_std_group_size)
            cin += 1
        k = self.kernel_size
        fan_in = k * k * cin
        wscale = self.wscale_gain / math.sqrt(fan_in)
        weight = self.param(
            "weight", nn.initializers.normal(stddev=1.0), (k, k, cin, self.out_channels)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        w = weight * wscale
        if self.downsample and self.fused_scale:
            w = transform_kernel_2d(w, average=True)
            x = jax.lax.conv_general_dilated(
                x, w,
                window_strides=(2, 2),
                padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        else:
            x = jax.lax.conv_general_dilated(
                x, w,
                window_strides=(1, 1),
                padding=((self.padding, self.padding),) * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        x = x + bias
        if self.activation_type == "lrelu":
            x = leaky_relu(x, 0.2)
        if self.downsample and not self.fused_scale:
            x = downscale2d(x)
        return x


class PGDense(nn.Module):
    features: int
    wscale_gain: float = _WSCALE_GAIN
    activation_type: str = "lrelu"

    @nn.compact
    def __call__(self, x):
        if x.ndim != 2:
            x = x.reshape(x.shape[0], -1)
        wscale = self.wscale_gain / math.sqrt(x.shape[-1])
        weight = self.param(
            "weight", nn.initializers.normal(stddev=1.0), (x.shape[-1], self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = x @ (weight * wscale) + bias
        if self.activation_type == "lrelu":
            y = leaky_relu(y, 0.2)
        return y


class PGGANDiscriminator(nn.Module):
    """image [N, R, R, C] -> scores [N, 1 + label_size] at static ``lod``."""

    resolution: int
    image_channels: int = 3
    label_size: int = 0
    fused_scale: bool = False
    minibatch_std_group_size: int = 16
    fmaps_base: int = 16 << 10
    fmaps_max: int = 512

    def get_nf(self, res):
        return min(self.fmaps_base // res, self.fmaps_max)

    @nn.compact
    def __call__(self, image, lod: float = 0.0):
        init_log2 = int(math.log2(_INIT_RES))
        final_log2 = int(math.log2(self.resolution))
        if lod + init_log2 > final_log2:
            raise ValueError(f"maximum lod is {final_log2 - init_log2}, got {lod}")

        x = None
        for res_log2 in range(final_log2, init_log2 - 1, -1):
            res = 2**res_log2
            block_idx = current_lod = final_log2 - res_log2
            # always call the FromRGB head (param materialisation; unused
            # results are dead-code-eliminated per lod)
            head = PGDConvBlock(
                in_channels=self.image_channels,
                out_channels=self.get_nf(res),
                kernel_size=1, padding=0, name=f"input{block_idx}",
            )(image if image.shape[1] == res else downscale2d(image, image.shape[1] // res))
            if current_lod <= lod < current_lod + 1:
                x = head
            elif current_lod - 1 < lod < current_lod:
                alpha = lod - math.floor(lod)
                x = head * alpha + x * (1 - alpha)
            if lod < current_lod + 1:
                if res != _INIT_RES:
                    x = PGDConvBlock(
                        in_channels=self.get_nf(res), out_channels=self.get_nf(res),
                        name=f"layer{2 * block_idx}",
                    )(x)
                    x = PGDConvBlock(
                        in_channels=self.get_nf(res), out_channels=self.get_nf(res // 2),
                        downsample=True, fused_scale=self.fused_scale,
                        name=f"layer{2 * block_idx + 1}",
                    )(x)
                else:
                    x = PGDConvBlock(
                        in_channels=self.get_nf(res), out_channels=self.get_nf(res),
                        minibatch_std_group_size=self.minibatch_std_group_size,
                        name=f"layer{2 * block_idx}",
                    )(x)
                    x = PGDense(self.get_nf(res // 2), name=f"layer{2 * block_idx + 1}")(x)
            if lod > current_lod:
                image = downscale2d(image)
        x = PGDense(
            1 + self.label_size, wscale_gain=1.0, activation_type="linear",
            name=f"layer{2 * block_idx + 2}",
        )(x)
        return x
