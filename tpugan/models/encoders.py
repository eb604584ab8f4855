"""Trainable GAN encoders (the "E" networks) — flax/NHWC.

TPU-native rebuild of /root/reference/model/E/:
  * ``Encoder`` (style_mode="dual", use_blur=False)  <- E.py  (case 1)
  * ``Encoder`` (use_blur=True)                      <- E_Blur.py (case 2):
    adds a binomial blur before the downsampling conv and switches to
    fused-scale (stride-2, transform-kernel) convs at resolutions >= 128
  * ablation variants (model/E/Ablation_Study/*) via flags:
    use_noise=False -> E_Blur_W; style_mode="single" (+use_noise=False)
    -> E_Blur_W_2 (both inver_mods exist; the post-conv w2 fills both
    slots, E_Blur_W_2.py:130);
    style_mode="none" -> E_Blur_Z (z head only)

Each block mirrors a generator DecodeBlock in reverse: it reads the
per-channel (mean, std) statistics as the style code *before* undoing them
with instance norm (E.py:51-67), and the per-block style pairs are emitted
deepest-first so ``w[:, 2i]``/``w[:, 2i+1]`` line up with generator layer i
(E.py:126-134).

Note: the reference hardcodes the fused-scale resolution ladder from 1024
regardless of layer_count (E_Blur.py:99 ``resolution = 1024``), so e.g. the
Cat256 case-2 config fuses blocks 0-3 even though the input is 256 px.
Matched exactly via ``base_resolution=1024`` (round 2 derived the ladder
from the input resolution, which diverged for sub-1024 E_Blur configs).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpugan.nn.layers import EqConv, EqLinear
from tpugan.ops.basic import (
    downscale2d,
    instance_moments,
    instance_norm,
    leaky_relu,
    noise_inject,
)
from tpugan.ops.s2d import (
    blur3x3_s2d,
    s2d_instance_moments,
    s2d_instance_norm,
    s2d_phase_mean,
    s2d_tile_channel,
    space_to_depth,
    use_s2d,
)
from tpugan.ops.upfirdn import blur3x3, setup_fir_kernel


class EncoderBlock(nn.Module):
    """BEBlock (E.py:16-85): style stats -> w pair, IN -> conv -> noise ->
    bias -> lrelu twice, downsample, 0.111/0.889 residual mix."""

    in_features: int
    out_features: int
    latent_size: int = 512
    has_last_conv: bool = True
    fused_scale: bool = False
    use_blur: bool = False
    use_noise: bool = True
    style_mode: str = "dual"  # dual | single | none
    style_stats: str = "meanstd"  # meanstd | std (E_v2_std: std-only heads)
    block_version: int = 2  # 2 = E.py; 1 = E_v1.py (pre-residual ordering)

    @nn.compact
    def __call__(self, x, noise: Optional[Sequence[jax.Array]] = None):
        if self.block_version == 1:
            return self._v1_forward(x, noise)
        if (
            self.fused_scale
            and self.has_last_conv
            and use_s2d(x.shape[1], x.shape[2], self.in_features)
        ):
            # opt-in (TPUGAN_S2D=1): the whole top-of-pyramid block runs
            # in space-to-depth domain so its lane-starved 16/32-channel
            # convs fill the 128-lane tile (ops/s2d.py); parameters and
            # semantics identical, reshape paid once at the block edge
            return self._s2d_forward(x, noise)
        cin, cout = self.in_features, self.out_features
        emit_styles = self.style_mode != "none"
        w1 = w2 = None

        def stats(y):
            mean, std = instance_moments(y)
            if self.style_stats == "std":
                # E_v2_std.py:56 uses torch's x.std((2,3)) — UNBIASED,
                # unlike the biased formula in E.py:52-53
                nhw = y.shape[1] * y.shape[2]
                return std * jnp.sqrt(nhw / max(nhw - 1, 1))
            return jnp.concatenate([mean, std], axis=-1)

        if emit_styles:
            w1 = EqLinear(self.latent_size, gain=1.0, name="inver_mod1")(stats(x))

        residual = x
        x = instance_norm(x)
        x = EqConv(cin, 3, padding=1, use_bias=False, name="conv_1")(x)

        key1 = key2 = None
        if self.use_noise and noise is None and self.has_rng("noise"):
            key1, key2 = jax.random.split(self.make_rng("noise"))
        if self.use_noise:
            nw1 = self.param("noise_weight_1", nn.initializers.zeros, (cin,))
            n1 = noise[0] if noise is not None else None
            x = noise_inject(x, nw1, key1, n1)
        b1 = self.param("bias_1", nn.initializers.zeros, (cin,))
        x = leaky_relu(x + b1, 0.2)

        if emit_styles:
            w2 = EqLinear(self.latent_size, gain=1.0, name="inver_mod2")(stats(x))
            if self.style_mode == "single":
                # E_Blur_W_2 keeps BOTH heads but its BE forward emits the
                # post-conv w2 twice (Ablation_Study/E_Blur_W_2.py:130)
                w1 = w2

        x = instance_norm(x)
        if self.has_last_conv:
            if self.use_blur:
                x = blur3x3(x)
            if self.fused_scale:
                x = EqConv(
                    cout, 3, stride=2, padding=1, use_bias=False,
                    transform_kernel=True, name="conv_2",
                )(x)
            else:
                x = EqConv(cout, 3, padding=1, use_bias=False, name="conv_2")(x)
            if self.use_noise:
                nw2 = self.param("noise_weight_2", nn.initializers.zeros, (cout,))
                n2 = noise[1] if noise is not None else None
                x = noise_inject(x, nw2, key2, n2)
            b2 = self.param("bias_2", nn.initializers.zeros, (cout,))
            x = leaky_relu(x + b2, 0.2)
            if not self.fused_scale:
                x = downscale2d(x)
            residual = downscale2d(residual)

        if cin != cout:
            residual = EqConv(cout, 1, name="conv_3")(residual)

        x = 0.111 * x + 0.889 * residual
        return x, w1, w2

    def _s2d_forward(self, x, noise):
        """The fused-scale v2 block computed in space-to-depth domain.

        Numerically the normal path up to reduction/accumulation order
        (convs/moments reassociate; the noise draw is the SAME original-
        resolution draw, reshaped). Parameter names/shapes are identical.
        """
        cin, cout = self.in_features, self.out_features
        emit_styles = self.style_mode != "none"
        w1 = w2 = None
        n, hh, ww, _ = x.shape

        def stats(ys):
            mean, std = s2d_instance_moments(ys)
            if self.style_stats == "std":
                nhw = ys.shape[1] * ys.shape[2] * 4
                return std * jnp.sqrt(nhw / max(nhw - 1, 1))
            return jnp.concatenate([mean, std], axis=-1)

        xs = space_to_depth(x)
        if emit_styles:
            w1 = EqLinear(self.latent_size, gain=1.0, name="inver_mod1")(stats(xs))

        residual_s = xs
        xs = s2d_instance_norm(xs)
        xs = EqConv(cin, 3, padding=1, use_bias=False, name="conv_1")(
            xs, s2d_in=True, s2d_out=True
        )

        key1 = key2 = None
        if self.use_noise and noise is None and self.has_rng("noise"):
            key1, key2 = jax.random.split(self.make_rng("noise"))
        if self.use_noise:
            nw1 = self.param("noise_weight_1", nn.initializers.zeros, (cin,))
            n1 = noise[0] if noise is not None else None
            if n1 is None and key1 is not None:
                n1 = jax.random.normal(key1, (n, hh, ww, 1), dtype=xs.dtype)
            if n1 is not None:
                xs = xs + s2d_tile_channel(nw1) * jnp.repeat(
                    space_to_depth(n1), cin, axis=-1
                )
        b1 = self.param("bias_1", nn.initializers.zeros, (cin,))
        xs = leaky_relu(xs + s2d_tile_channel(b1), 0.2)

        if emit_styles:
            w2 = EqLinear(self.latent_size, gain=1.0, name="inver_mod2")(stats(xs))
            if self.style_mode == "single":
                w1 = w2

        xs = s2d_instance_norm(xs)
        if self.use_blur:
            xs = blur3x3_s2d(xs, setup_fir_kernel((1.0, 2.0, 1.0)))
        x = EqConv(
            cout, 3, stride=2, padding=1, use_bias=False,
            transform_kernel=True, name="conv_2",
        )(xs, s2d_in=True)
        if self.use_noise:
            nw2 = self.param("noise_weight_2", nn.initializers.zeros, (cout,))
            n2 = noise[1] if noise is not None else None
            x = noise_inject(x, nw2, key2, n2)
        b2 = self.param("bias_2", nn.initializers.zeros, (cout,))
        x = leaky_relu(x + b2, 0.2)

        residual = s2d_phase_mean(residual_s)
        if cin != cout:
            residual = EqConv(cout, 1, name="conv_3")(residual)
        return 0.111 * x + 0.889 * residual, w1, w2

    def _v1_forward(self, x, noise):
        """E_v1 block (Ablation_Study/E_v1.py:67-100): conv before IN,
        plain resnet-style residual (conv_3 + affine IN), no 0.111 mix."""
        cin, cout = self.in_features, self.out_features
        residual = x

        def stats(y):
            mean, std = instance_moments(y)
            return jnp.concatenate([mean, std], axis=-1)

        w1 = EqLinear(self.latent_size, gain=1.0, name="inver_mod1")(stats(x))

        key1 = key2 = None
        if self.use_noise and noise is None and self.has_rng("noise"):
            key1, key2 = jax.random.split(self.make_rng("noise"))
        x = EqConv(cin, 3, padding=1, use_bias=False, name="conv_1")(x)
        x = instance_norm(x)
        nw1 = self.param("noise_weight_1", nn.initializers.zeros, (cin,))
        x = noise_inject(x, nw1, key1, noise[0] if noise is not None else None)
        b1 = self.param("bias_1", nn.initializers.zeros, (cin,))
        x = leaky_relu(x + b1, 0.2)

        w2 = EqLinear(self.latent_size, gain=1.0, name="inver_mod2")(stats(x))

        if self.has_last_conv:
            x = EqConv(cout, 3, padding=1, use_bias=False, name="conv_2")(x)
            x = instance_norm(x)
            nw2 = self.param("noise_weight_2", nn.initializers.zeros, (cout,))
            x = noise_inject(x, nw2, key2, noise[1] if noise is not None else None)
            b2 = self.param("bias_2", nn.initializers.zeros, (cout,))
            x = x + b2
            if cin != cout:
                residual = EqConv(cout, 1, name="conv_3")(residual)
                residual = instance_norm(residual)
                g = self.param("in3_scale", nn.initializers.ones, (cout,))
                bb = self.param("in3_bias", nn.initializers.zeros, (cout,))
                residual = residual * g + bb
            x = x + residual
            x = leaky_relu(x, 0.2)
            x = downscale2d(x)
        return x, w1, w2


class Encoder(nn.Module):
    """BE (E.py:88-135) / BE_Blur (E_Blur.py) and ablation variants.

    forward: images [N, R, R, C] -> (const features [N, 4, 4, maxf],
    w [N, 2*layer_count, latent]) with per-block style pairs reversed to
    match generator layer order. ``start_block`` reproduces the reference's
    progressive ``block_num`` offset (E.py:122-134); default runs all blocks.
    """

    startf: int = 16
    maxf: int = 512
    layer_count: int = 9
    latent_size: int = 512
    channels: int = 3
    use_blur: bool = False
    use_noise: bool = True
    style_mode: str = "dual"  # dual | single | none
    style_stats: str = "meanstd"  # std -> E_v2_std ablation encoder
    block_version: int = 2  # 1 -> E_v1 pre-residual blocks
    z_head: bool = False  # E_Blur_Z: stride-2 conv head 4x4 -> z (out_z)
    # the torch fused-scale ladder starts at 1024 regardless of input size
    # (E_Blur.py:99) — fused_scale = ladder_resolution >= 128 per block
    base_resolution: int = 1024

    @nn.compact
    def __call__(self, x, start_block: int = 0, noise=None):
        resolution = self.base_resolution
        x = EqConv(self.startf, 1, name="from_rgb")(x)
        x = leaky_relu(x, 0.2)

        inputs = self.startf
        outputs = self.startf * 2
        styles = []
        for i in range(self.layer_count):
            has_last_conv = i + 1 != self.layer_count
            fused_scale = self.use_blur and resolution >= 128
            block = EncoderBlock(
                in_features=inputs,
                out_features=outputs,
                latent_size=self.latent_size,
                has_last_conv=has_last_conv,
                fused_scale=fused_scale,
                use_blur=self.use_blur,
                use_noise=self.use_noise,
                style_mode=self.style_mode,
                style_stats=self.style_stats,
                block_version=self.block_version,
                name=f"block_{i}",
            )
            if i >= start_block:
                ni = noise[i] if noise is not None else None
                x, w1, w2 = block(x, ni)
                if self.style_mode != "none":
                    # (w2, w1) pair per block, later blocks in front (E.py:130-134)
                    styles.append(jnp.stack([w2, w1], axis=1))
            inputs = min(self.maxf, inputs * 2)
            outputs = min(self.maxf, outputs * 2)
            resolution //= 2

        if self.style_mode == "none":
            if self.z_head:
                # E_Blur_Z out_z: ln.Conv2d(512, 512, 3, 2) on the 4x4
                # features -> [N, 1, 1, latent] -> [N, latent]
                z = EqConv(self.latent_size, 3, stride=2, name="out_z")(x)
                return x, z.reshape(z.shape[0], self.latent_size)
            return x, None
        w = jnp.concatenate(styles[::-1], axis=1)
        return x, w


class PGEncoderBlock(nn.Module):
    """E_PG BEBlock (model/E/E_PG.py:39-108): no style heads; residual via
    1x1 conv + affine instance norm; post-block avg-pool."""

    in_features: int
    out_features: int
    has_second_conv: bool = True
    use_noise: bool = True

    @nn.compact
    def __call__(self, x, noise=None):
        cin, cout = self.in_features, self.out_features
        residual = x
        x = instance_norm(x)
        x = EqConv(cin, 3, padding=1, use_bias=False, name="conv_1")(x)
        key1 = key2 = None
        if self.use_noise and noise is None and self.has_rng("noise"):
            key1, key2 = jax.random.split(self.make_rng("noise"))
        nw1 = self.param("noise_weight_1", nn.initializers.zeros, (cin,))
        x = noise_inject(x, nw1, key1, noise[0] if noise is not None else None)
        b1 = self.param("bias_1", nn.initializers.zeros, (cin,))
        x = leaky_relu(x + b1, 0.2)

        if self.has_second_conv:
            x = instance_norm(x)
            x = EqConv(cout, 3, padding=1, use_bias=False, name="conv_2")(x)
            nw2 = self.param("noise_weight_2", nn.initializers.zeros, (cout,))
            x = noise_inject(x, nw2, key2, noise[1] if noise is not None else None)
            b2 = self.param("bias_2", nn.initializers.zeros, (cout,))
            x = x + b2
            if cin != cout:
                residual = EqConv(cout, 1, name="conv_3")(residual)
                residual = instance_norm(residual)
                # affine instance norm (E_PG.py:67)
                g = self.param("in3_scale", nn.initializers.ones, (cout,))
                b = self.param("in3_bias", nn.initializers.zeros, (cout,))
                residual = residual * g + b
            x = x + residual
            x = leaky_relu(x, 0.2)
            x = downscale2d(x)
        return x


class PGEncoder(nn.Module):
    """E_PG BE (model/E/E_PG.py:111-164): FromRGB -> blocks -> flattened
    4x4 dense head to z.

    NOTE the reference forward computes ``new_final`` but then returns the
    pre-head ``(tensor(0), tensor(0))`` (E_PG.py:163-164 discards x) — an
    outright bug that would crash its own training script. Here the
    intended contract is implemented: returns (features, z [N, latent]).
    """

    startf: int = 64
    maxf: int = 512
    layer_count: int = 7
    latent_size: int = 512
    channels: int = 3

    @nn.compact
    def __call__(self, x, noise=None):
        x = EqConv(self.startf, 1, name="from_rgb")(x)
        x = leaky_relu(x, 0.2)
        inputs, outputs = self.startf, self.startf * 2
        for i in range(self.layer_count):
            has_second_conv = i + 1 != self.layer_count
            ni = noise[i] if noise is not None else None
            x = PGEncoderBlock(
                in_features=inputs, out_features=outputs,
                has_second_conv=has_second_conv, name=f"block_{i}",
            )(x, ni)
            inputs = min(self.maxf, inputs * 2)
            outputs = min(self.maxf, outputs * 2)
        feats = x
        z = EqLinear(self.latent_size, gain=1.0, name="new_final")(
            x.reshape(x.shape[0], -1)
        )
        return feats, z


class BigGANEncoderBlock(nn.Module):
    """E_BIG BEBlock (model/E/E_BIG.py:93-169): conditional BigGAN batch
    norms replace instance norm; includes the reference's double-lrelu
    quirk on channel-changing blocks (:158,163)."""

    in_features: int
    out_features: int
    cond_dim: int = 256
    n_stats: int = 51
    has_second_conv: bool = True
    truncation: float = 0.4  # hardcoded in the reference forward (:217)

    @nn.compact
    def __call__(self, x, cond_vector, noise=None):
        from tpugan.models.biggan import BigGANBatchNorm

        cin, cout = self.in_features, self.out_features

        def bn(name):
            return BigGANBatchNorm(
                cin, self.cond_dim, n_stats=self.n_stats, eps=1e-12,
                conditional=True, sn=True, name=name,
            )

        residual = x
        x = bn("batch_norm_1")(x, self.truncation, cond_vector)
        x = EqConv(cin, 3, padding=1, use_bias=False, name="conv_1")(x)
        key1 = key2 = None
        if noise is None and self.has_rng("noise"):
            key1, key2 = jax.random.split(self.make_rng("noise"))
        nw1 = self.param("noise_weight_1", nn.initializers.zeros, (cin,))
        x = noise_inject(x, nw1, key1, noise[0] if noise is not None else None)
        b1 = self.param("bias_1", nn.initializers.zeros, (cin,))
        x = leaky_relu(x + b1, 0.2)

        if self.has_second_conv:
            x = bn("batch_norm_2")(x, self.truncation, cond_vector)
            x = EqConv(cout, 3, padding=1, use_bias=False, name="conv_2")(x)
            nw2 = self.param("noise_weight_2", nn.initializers.zeros, (cout,))
            x = noise_inject(x, nw2, key2, noise[1] if noise is not None else None)
            b2 = self.param("bias_2", nn.initializers.zeros, (cout,))
            x = leaky_relu(x + b2, 0.2)
            if cin != cout:
                residual = bn("batch_norm_3")(residual, self.truncation, cond_vector)
                residual = EqConv(cout, 1, name="conv_3")(residual)
                x = leaky_relu(x, 0.2)  # reference double-lrelu quirk (:163)
            x = x + residual
            x = downscale2d(x)
        return x


class BigGANEncoder(nn.Module):
    """E_BIG BE (model/E/E_BIG.py:172-227): plain-conv FromRGB, conditional
    blocks, dual heads -> (cond_vector [N, 256], z [N, 128])."""

    startf: int = 64
    maxf: int = 512
    layer_count: int = 7
    channels: int = 3
    cond_dim: int = 256
    z_dim: int = 128

    @nn.compact
    def __call__(self, x, cond_vector, noise=None):
        # E_BIG uses a plain torch Conv2d FromRGB (:87), not an lreq conv
        x = nn.Conv(self.startf, (1, 1), name="from_rgb")(x)
        x = leaky_relu(x, 0.2)
        inputs, outputs = self.startf, self.startf * 2
        for i in range(self.layer_count):
            has_second_conv = i + 1 != self.layer_count
            ni = noise[i] if noise is not None else None
            x = BigGANEncoderBlock(
                in_features=inputs, out_features=outputs, cond_dim=self.cond_dim,
                has_second_conv=has_second_conv, name=f"block_{i}",
            )(x, cond_vector, ni)
            inputs = min(self.maxf, inputs * 2)
            outputs = min(self.maxf, outputs * 2)
        c_v = EqLinear(self.cond_dim, gain=1.0, name="new_final_1")(
            x.reshape(x.shape[0], -1)
        )
        z = EqLinear(self.z_dim, gain=1.0, name="new_final_2")(c_v)
        return c_v, z
