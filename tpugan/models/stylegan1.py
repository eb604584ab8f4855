"""StyleGANv1 (ALAE-style) generator, mapping and discriminator — flax/NHWC.

TPU-native rebuild of /root/reference/model/stylegan1/net.py:
  * ``StyleGANv1Mapping``  <- Mapping (net.py:441-466)
  * ``StyleGANv1Generator`` <- Generator/DecodeBlock/ToRGB (net.py:110-362)
  * ``StyleGANv1Discriminator`` <- Discriminator (net.py:365-429)

Differences by design: NHWC tensors, explicit PRNG for noise injection
(rng collection ``noise``; parity tests pass recorded noise tensors), blur
through the fused upfirdn2d op, and the progressive `lod` is a static
python int so each resolution compiles to its own XLA program.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpugan.nn.layers import EqConv, EqLinear
from tpugan.ops.basic import (
    downscale2d,
    instance_norm,
    leaky_relu,
    minibatch_stddev,
    noise_inject,
    pixel_norm,
    style_mod,
    upscale2d,
)
from tpugan.ops.upfirdn import blur3x3


def truncation_coefs(num_layers: int, psi: float = 0.7, cutoff: Optional[int] = None) -> jax.Array:
    """Per-layer truncation coefficients: ``psi`` for the first half
    (or ``cutoff``) of the style layers, 1.0 after.

    Reference: E_align_cropping_s1.py:38-41.
    """
    if cutoff is None:
        cutoff = num_layers // 2
    idx = jnp.arange(num_layers)
    return jnp.where(idx < cutoff, psi, 1.0)[None, :, None]


class MappingBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        return leaky_relu(EqLinear(self.features, lrmul=0.01, name="fc")(x), 0.2)


class StyleGANv1Mapping(nn.Module):
    """z [N, latent] -> w+ [N, num_layers, dlatent] with optional truncation.

    ``center`` is the loaded truncation center tensor ([num_layers, dlatent],
    the reference's ``center_tensor.pt`` buffer, net.py:452,463-464); pass
    None to skip truncation, and ``coefs`` from :func:`truncation_coefs`.
    """

    num_layers: int = 18
    mapping_layers: int = 8
    latent_size: int = 512
    dlatent_size: int = 512
    mapping_fmaps: int = 512

    @nn.compact
    def __call__(self, z, coefs=None, center=None):
        x = pixel_norm(z, axis=-1)
        for i in range(self.mapping_layers):
            features = self.dlatent_size if i == self.mapping_layers - 1 else self.mapping_fmaps
            x = MappingBlock(features, name=f"block_{i + 1}")(x)
        x = jnp.repeat(x[:, None, :], self.num_layers, axis=1)
        if center is not None:
            coefs = 1.0 if coefs is None else jnp.asarray(coefs).astype(x.dtype)
            c = center[None].astype(x.dtype)
            x = c + (x - c) * coefs
        return x


class DecodeBlock(nn.Module):
    """One synthesis block: (upsample-conv, blur)? -> noise -> bias -> lrelu
    -> IN -> AdaIN, twice (net.py:110-169)."""

    features: int
    has_first_conv: bool = True
    fused_scale: bool = True
    layer_index: int = 0

    @nn.compact
    def __call__(
        self,
        x,
        s1,
        s2,
        noise: Optional[Sequence[jax.Array]] = None,
        x_pair: Optional[jax.Array] = None,
    ):
        """Standard forward, or the paired ``forward_double`` used by blob
        removal (net.py:171-231) when ``x_pair`` is given: both streams
        share the same noise and are normalised with the *main* stream's
        (unbiased) spatial statistics."""
        c = self.features
        double = x_pair is not None

        if self.has_first_conv:
            if self.fused_scale:
                conv1 = EqConv(
                    c, 3, stride=2, padding=1, use_bias=False,
                    transpose=True, transform_kernel=True, name="conv_1",
                )
                first_conv = conv1
            else:
                conv1 = EqConv(c, 3, padding=1, use_bias=False, name="conv_1")
                first_conv = lambda y: conv1(upscale2d(y))
            x = blur3x3(first_conv(x))
            if double:
                x_pair = blur3x3(first_conv(x_pair))

        nw1 = self.param("noise_weight_1", nn.initializers.zeros, (c,))
        nw2 = self.param("noise_weight_2", nn.initializers.zeros, (c,))
        b1 = self.param("bias_1", nn.initializers.zeros, (c,))
        b2 = self.param("bias_2", nn.initializers.zeros, (c,))

        n1 = noise[0] if noise is not None else None
        n2 = noise[1] if noise is not None else None
        key1 = key2 = None
        if noise is None and self.has_rng("noise"):
            key1, key2 = jax.random.split(self.make_rng("noise"))
        if double and n1 is None:
            # shared noise between the streams (net.py:182-187)
            n, h, w = x.shape[0], x.shape[1], x.shape[2]
            n1 = jax.random.normal(key1, (n, h, w, 1)) if key1 is not None else None
            n2 = jax.random.normal(key2, (n, h, w, 1)) if key2 is not None else None
            key1 = key2 = None

        def shared_norm(main, pair):
            """Normalise both streams by the *main* stream's per-channel
            spatial mean and *unbiased* std (torch .std default,
            net.py:196-199)."""
            mean = jnp.mean(main, axis=(1, 2), keepdims=True)
            nhw = main.shape[1] * main.shape[2]
            var = jnp.sum(jnp.square(main - mean), axis=(1, 2), keepdims=True) / max(nhw - 1, 1)
            std = jnp.sqrt(var)
            return (main - mean) / std, (pair - mean) / std

        style1 = EqLinear(2 * c, gain=1.0, name="style_1")(s1)
        x = leaky_relu(noise_inject(x, nw1, key1, n1) + b1, 0.2)
        if double:
            x_pair = leaky_relu(noise_inject(x_pair, nw1, None, n1) + b1, 0.2)
            x, x_pair = shared_norm(x, x_pair)
        else:
            x = instance_norm(x)
        x = style_mod(x, style1)
        if double:
            x_pair = style_mod(x_pair, style1)

        conv2 = EqConv(c, 3, padding=1, use_bias=False, name="conv_2")
        style2 = EqLinear(2 * c, gain=1.0, name="style_2")(s2)
        x = conv2(x)
        if double:
            x_pair = conv2(x_pair)
        x = leaky_relu(noise_inject(x, nw2, key2, n2) + b2, 0.2)
        if double:
            x_pair = leaky_relu(noise_inject(x_pair, nw2, None, n2) + b2, 0.2)
            x, x_pair = shared_norm(x, x_pair)
        else:
            x = instance_norm(x)
        x = style_mod(x, style2)
        if double:
            x_pair = style_mod(x_pair, style2)
            return x, x_pair
        return x


class ToRGB(nn.Module):
    channels: int = 3

    @nn.compact
    def __call__(self, x):
        return EqConv(self.channels, 1, gain=1.0, name="to_rgb")(x)


class StyleGANv1Generator(nn.Module):
    """Synthesis network Gs (net.py:256-362).

    channel ladder: block i has min(maxf, startf * 2^(L-1-i)) outputs;
    fused_scale once the output resolution reaches 128 (net.py:285).
    forward(styles [N, 2L, latent], lod) runs blocks 0..lod and applies
    to_rgb[lod]; ``blend`` < 1 lerps with the upsampled previous-lod RGB
    (decode2, net.py:338-354).
    """

    startf: int = 32
    maxf: int = 256
    layer_count: int = 3
    latent_size: int = 128
    channels: int = 3

    def setup(self):
        mul = 2 ** (self.layer_count - 1)
        inputs = min(self.maxf, self.startf * mul)
        self.const = self.param(
            "const", nn.initializers.ones, (1, 4, 4, inputs)
        )
        blocks = []
        rgbs = []
        resolution = 2
        feats = []
        for i in range(self.layer_count):
            outputs = min(self.maxf, self.startf * mul)
            has_first_conv = i != 0
            fused_scale = resolution * 2 >= 128
            blocks.append(
                DecodeBlock(
                    outputs,
                    has_first_conv=has_first_conv,
                    fused_scale=fused_scale,
                    layer_index=i,
                    name=f"decode_block_{i}",
                )
            )
            rgbs.append(ToRGB(self.channels, name=f"to_rgb_{i}"))
            feats.append(outputs)
            resolution *= 2
            mul //= 2
        self.decode_block = blocks
        self.to_rgb = rgbs
        self.block_features = tuple(feats)

    def __call__(self, styles, lod=None, blend=1.0, noise=None):
        lod = self.layer_count - 1 if lod is None else lod
        if not 0 <= lod < self.layer_count:
            raise ValueError(f"lod {lod} out of range for layer_count {self.layer_count}")
        if styles.shape[1] < 2 * (lod + 1):
            raise ValueError(
                f"styles has {styles.shape[1]} layers; lod {lod} needs {2 * (lod + 1)}"
            )
        if blend == 1.0:
            return self.decode(styles, lod, noise)
        return self.decode2(styles, lod, blend, noise)

    def decode(self, styles, lod, noise=None):
        x = jnp.repeat(self.const, styles.shape[0], axis=0)
        for i in range(lod + 1):
            ni = noise[i] if noise is not None else None
            x = self.decode_block[i](x, styles[:, 2 * i], styles[:, 2 * i + 1], ni)
        return self.to_rgb[lod](x)

    def decode3(self, styles, lod, noise=None, remove_blob=True, blob_threshold=300.0):
        """Blob-removal decode (net.py:303-329): clone the stream after
        block 3, zero activations above the threshold in the clone, and run
        the remaining blocks as shared-statistics pairs (forward_double).
        At lod 8 the result goes through to_rgb; lower lods return the
        reference's normalized channel-max heatmap."""
        x = jnp.repeat(self.const, styles.shape[0], axis=0)
        x_pair = None
        for i in range(lod + 1):
            ni = noise[i] if noise is not None else None
            if i < 4 or not remove_blob:
                x = self.decode_block[i](x, styles[:, 2 * i], styles[:, 2 * i + 1], ni)
                if remove_blob and i == 3:
                    x_pair = jnp.where(x > blob_threshold, 0.0, x)
            else:
                x, x_pair = self.decode_block[i](
                    x, styles[:, 2 * i], styles[:, 2 * i + 1], ni, x_pair
                )
        if x_pair is not None:
            x = x_pair
        if lod == 8:
            return self.to_rgb[lod](x)
        # normalized channel-max grayscale preview (net.py:324-328)
        x = jnp.max(x, axis=-1, keepdims=True)
        x = x - jnp.min(x)
        x = x / jnp.max(x)
        x = jnp.power(x, 1.0 / 2.2)
        return jnp.tile(x, (1, 1, 1, 3))

    def decode2(self, styles, lod, blend, noise=None):
        x = jnp.repeat(self.const, styles.shape[0], axis=0)
        for i in range(lod):
            ni = noise[i] if noise is not None else None
            x = self.decode_block[i](x, styles[:, 2 * i], styles[:, 2 * i + 1], ni)
        x_prev = self.to_rgb[lod - 1](x)
        ni = noise[lod] if noise is not None else None
        x = self.decode_block[lod](x, styles[:, 2 * lod], styles[:, 2 * lod + 1], ni)
        x = self.to_rgb[lod](x)
        x_prev = upscale2d(x_prev)
        return x_prev + (x - x_prev) * blend


class StyleGANv1Mapping2(nn.Module):
    """Mapping2 (net.py:469-497): pyramid map to/from the full w+ stack.

    ``inverse=False``: z [N, latent] -> w+ [N, num_layers, latent] with the
    last block expanding to num_layers*latent; ``inverse=True``: w+ -> z.
    """

    num_layers: int = 18
    mapping_layers: int = 8
    latent_size: int = 512
    inverse: bool = False

    @nn.compact
    def __call__(self, z, coefs=None):
        x = pixel_norm(z, axis=-1)
        if not self.inverse:
            for i in range(1, self.mapping_layers):
                x = MappingBlock(self.latent_size, name=f"block_{i}")(x)
            x = MappingBlock(self.num_layers * self.latent_size, name=f"block_{self.mapping_layers}")(x)
            return x.reshape(-1, self.num_layers, self.latent_size)
        x = x.reshape(-1, self.num_layers * self.latent_size)
        x = MappingBlock(self.latent_size, name=f"block_{self.mapping_layers}")(x)
        for i in range(self.mapping_layers - 1, 0, -1):
            x = MappingBlock(self.latent_size, name=f"block_{i}")(x)
        return x


class StyleGANv1Mapping3(nn.Module):
    """Mapping3 (net.py:500-528): widening pyramid 512 -> 512*18."""

    num_layers: int = 18
    latent_size: int = 512

    @nn.compact
    def __call__(self, z, coefs=None):
        x = pixel_norm(z, axis=-1)
        widths = [2, 4, 6, 8, 10, 12, 14, self.num_layers]
        for i, mul in enumerate(widths):
            x = MappingBlock(self.latent_size * mul, name=f"block_{i + 1}")(x)
        return x.reshape(-1, self.num_layers, self.latent_size)


class StyleGANv1Mapping4(nn.Module):
    """Mapping4 (net.py:530-558): narrowing pyramid 512*18 -> 512."""

    num_layers: int = 18
    latent_size: int = 512

    @nn.compact
    def __call__(self, w, coefs=None):
        x = pixel_norm(w, axis=-1)
        x = x.reshape(-1, self.num_layers * self.latent_size)
        widths = [14, 12, 10, 8, 6, 4, 2, 1]
        for i, mul in enumerate(widths):
            x = MappingBlock(self.latent_size * mul, name=f"block_{i + 1}")(x)
        return x


class DiscriminatorBlock(nn.Module):
    features: int
    last: bool = False
    fused_scale: bool = True

    @nn.compact
    def __call__(self, x):
        inputs = x.shape[-1]
        if self.last:
            x = minibatch_stddev(x)
        # conv_1 maps inputs(+1 stddev channel if last) -> inputs (net.py:74)
        x = EqConv(inputs, 3, padding=1, use_bias=False, name="conv_1")(x)
        b1 = self.param("bias_1", nn.initializers.zeros, (inputs,))
        x = leaky_relu(x + b1, 0.2)
        if self.last:
            x = EqLinear(self.features, name="dense")(x.reshape(x.shape[0], -1))
        else:
            x = blur3x3(x)
            if self.fused_scale:
                x = EqConv(
                    self.features, 3, stride=2, padding=1, use_bias=False,
                    transform_kernel=True, name="conv_2",
                )(x)
            else:
                x = EqConv(self.features, 3, padding=1, use_bias=False, name="conv_2")(x)
                x = downscale2d(x)
            b2 = self.param("bias_2", nn.initializers.zeros, (self.features,))
            x = x + b2
        return leaky_relu(x, 0.2)


class StyleGANv1Discriminator(nn.Module):
    """Progressive discriminator (net.py:365-429); secondary to the encoder
    pipeline but kept for capability parity."""

    startf: int = 32
    maxf: int = 256
    layer_count: int = 3
    channels: int = 3

    @nn.compact
    def __call__(self, x, lod=None):
        lod = self.layer_count - 1 if lod is None else lod
        mul = 2
        inputs = self.startf
        specs = []
        resolution = 2 ** (self.layer_count + 1)
        for i in range(self.layer_count):
            outputs = min(self.maxf, self.startf * mul)
            specs.append((inputs, outputs, i == self.layer_count - 1, resolution >= 128))
            resolution //= 2
            inputs = outputs
            mul *= 2

        start = self.layer_count - lod - 1
        x = EqConv(specs[start][0], 1, name=f"from_rgb_{start}")(x)
        x = leaky_relu(x, 0.2)
        for i in range(start, self.layer_count):
            _, outputs, last, fused = specs[i]
            x = DiscriminatorBlock(outputs, last=last, fused_scale=fused, name=f"encode_block_{i}")(x)
        return EqLinear(1, gain=1.0, name="fc2")(x)
