"""StyleGAN2 (GenForce-style, config F) generator — flax/NHWC.

TPU-native rebuild of /root/reference/model/stylegan2_generator.py:
  * ``SG2Mapping``    <- MappingModule (:199-278)
  * ``SG2Truncation`` <- TruncationModule (:281-333)
  * ``SG2Synthesis``  <- SynthesisModule (:336-539) — 'skip' (default),
    'origin' and 'resnet' architectures
  * ``ModulatedConv`` <- ModulateConvBlock (:742-922)
  * ``StyleGAN2Generator`` <- StyleGAN2Generator (:35-196); returns the same
    result-dict contract {'image', 'wp', 'w', 'z', 'style..'} subset.

TPU-first design notes
----------------------
The reference's "fused" modulated conv reshapes activations to
[1, N*C, H, W] and runs a grouped conv with batch-many weight copies
(:872-904) — a CUDA-friendly trick that is hostile to the MXU. Here
modulation always uses the linear-equivalence form: scale the *inputs* by
the style, convolve with the one shared weight (dense MXU matmul), then
divide the *outputs* by the demodulation norm. Identical numerics
(convolution is linear in the input), no per-sample weights, no reshape
traffic. The up-sampling path is lhs-dilated conv + the fused upfirdn2d
(Pallas) filter; weights are stored in the reference's unscaled ("wscale")
parameterization so converted checkpoints drop straight in.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name as _checkpoint_name

from tpugan.ops.basic import leaky_relu, pixel_norm
from tpugan.ops.s2d import conv_s2d, use_s2d
from tpugan.ops.upfirdn import setup_fir_kernel, upfirdn2d

_WSCALE_GAIN = 1.0
_INIT_RES = 4


def _activate(x, activation_type: str):
    if activation_type == "linear":
        return x
    if activation_type == "lrelu":
        return leaky_relu(x, 0.2) * math.sqrt(2.0)
    raise NotImplementedError(f"activation: {activation_type}")


class SG2Dense(nn.Module):
    """DenseBlock (:925-996): wscale linear + optional additional bias."""

    features: int
    add_bias: bool = True
    additional_bias: float = 0.0
    lr_mul: float = 1.0
    activation_type: str = "lrelu"

    @nn.compact
    def __call__(self, x):
        if x.ndim != 2:
            x = x.reshape(x.shape[0], -1)
        in_features = x.shape[-1]
        wscale = _WSCALE_GAIN / math.sqrt(in_features) * self.lr_mul
        # stored unscaled: init randn/lr_mul, scaled by wscale at forward
        weight = self.param(
            "weight", nn.initializers.normal(stddev=1.0 / self.lr_mul),
            (in_features, self.features),
        )
        y = x @ (weight * wscale)
        if self.add_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias * self.lr_mul
        return _activate(y + self.additional_bias, self.activation_type)


class SG2Mapping(nn.Module):
    """MappingModule (:199-278). Returns dict(z, label, w [, embedding])."""

    input_space_dim: int = 512
    hidden_space_dim: int = 512
    final_space_dim: int = 512
    label_size: int = 0
    num_layers: int = 8
    normalize_input: bool = True
    lr_mul: float = 0.01

    @nn.compact
    def __call__(self, z, label=None):
        if z.ndim != 2 or z.shape[1] != self.input_space_dim:
            raise ValueError(
                f"latent code must be [batch, {self.input_space_dim}], got {z.shape}"
            )
        results = {}
        if self.label_size:
            if label is None:
                raise ValueError(f"model requires a label of size {self.label_size}")
            label_weight = self.param(
                "label_weight", nn.initializers.normal(stddev=1.0),
                (self.label_size, self.input_space_dim),
            )
            embedding = label @ label_weight
            z = jnp.concatenate([z, embedding], axis=1)
            results["embedding"] = embedding
        if self.normalize_input:
            z = pixel_norm(z, axis=-1)
        w = z
        for i in range(self.num_layers):
            features = (
                self.final_space_dim if i == self.num_layers - 1 else self.hidden_space_dim
            )
            w = SG2Dense(features, lr_mul=self.lr_mul, name=f"dense{i}")(w)
        results.update(z=z, label=label, w=w)
        return results


class SG2Truncation(nn.Module):
    """TruncationModule (:281-333) with the w_avg buffer."""

    w_space_dim: int = 512
    num_layers: int = 18
    repeat_w: bool = True

    @nn.compact
    def __call__(self, w, trunc_psi=None, trunc_layers=None):
        w_avg = self.variable(
            "buffers", "w_avg",
            lambda: jnp.zeros(
                (self.w_space_dim,) if self.repeat_w
                else (self.num_layers * self.w_space_dim,)
            ),
        ).value
        if w.ndim == 2:
            if self.repeat_w and w.shape[1] == self.w_space_dim:
                wp = jnp.repeat(w[:, None, :], self.num_layers, axis=1)
            else:
                assert w.shape[1] == self.w_space_dim * self.num_layers
                wp = w.reshape(-1, self.num_layers, self.w_space_dim)
        else:
            wp = w
        assert wp.ndim == 3 and wp.shape[1:] == (self.num_layers, self.w_space_dim)

        trunc_psi = 1.0 if trunc_psi is None else trunc_psi
        trunc_layers = 0 if trunc_layers is None else trunc_layers
        if trunc_psi < 1.0 and trunc_layers > 0:
            idx = jnp.arange(self.num_layers)[None, :, None]
            # cast to wp's dtype so bf16 activations don't promote to fp32
            coefs = jnp.where(idx < trunc_layers, trunc_psi, 1.0).astype(wp.dtype)
            avg = w_avg.reshape(1, -1, self.w_space_dim).astype(wp.dtype)
            wp = avg + (wp - avg) * coefs
        return wp


def update_w_avg(w_avg, w, decay: float = 0.995, axis_name: Optional[str] = None):
    """The training-mode w_avg EMA, with the cross-replica mean the
    reference commented out (stylegan2_generator.py:177-182) restored as a
    ``pmean`` when running under a mapped axis."""
    batch_mean = jnp.mean(w, axis=0)
    if axis_name is not None:
        batch_mean = jax.lax.pmean(batch_mean, axis_name)
    return w_avg * decay + batch_mean * (1.0 - decay)


class ModulatedConv(nn.Module):
    """ModulateConvBlock (:742-922), input-scale/output-demod formulation.

    Weight stored OIHW-equivalent as HWIO [k, k, in, out], unscaled.
    Noise is the checkpointed buffer (collection ``buffers``) unless
    ``noise`` / rng-randomized.
    """

    in_channels: int
    out_channels: int
    resolution: int
    w_space_dim: int = 512
    kernel_size: int = 3
    add_bias: bool = True
    scale_factor: int = 1
    demodulate: bool = True
    lr_mul: float = 1.0
    add_noise: bool = True
    activation_type: str = "lrelu"
    epsilon: float = 1e-8

    @nn.compact
    def __call__(self, x, w, randomize_noise: bool = False, noise: Optional[jax.Array] = None):
        k = self.kernel_size
        fan_in = k * k * self.in_channels
        wscale = _WSCALE_GAIN / math.sqrt(fan_in) * self.lr_mul
        weight = self.param(
            "weight", nn.initializers.normal(stddev=1.0 / self.lr_mul),
            (k, k, self.in_channels, self.out_channels),
        )
        weight = weight * wscale

        style = SG2Dense(
            self.in_channels, additional_bias=1.0, activation_type="linear", name="style"
        )(w)
        # NB: the ToRGB instances of this block (out_channels=3, k=1) are
        # NOT subject to the BigGAN to-rgb narrow-lane pathology
        # (models/biggan.py): zero-padding their output dim to 8/32/128
        # lanes + barrier/slice was measured at SG2-1024 bf16 and LOST
        # (25.2 -> 25.3/27.1/30.4 ms synthesize fwd). XLA lowers a native
        # narrow 1x1 conv fine; the BigGAN problem was the slice SINKING
        # into a wide 3x3 conv.

        # demodulation norm over (k, k, in) of the style-scaled weight;
        # accumulated in fp32 regardless of compute dtype (bf16-safe)
        if self.demodulate:
            norm = jnp.sqrt(
                jnp.einsum(
                    "hwio,ni->no",
                    jnp.square(weight.astype(jnp.float32)),
                    jnp.square(style.astype(jnp.float32)),
                )
                + self.epsilon
            ).astype(x.dtype)  # [N, out]

        x = x * style[:, None, None, :]  # input-scale modulation

        if self.scale_factor > 1:
            # The reference pre-flips the kernel before conv_transpose2d
            # (:880, TF-compat), which cancels the transpose-conv's internal
            # flip — so the op is a plain lhs-dilated *correlation* with the
            # unflipped weight -> [2H+1], then FIR (1,3,3,1) gain=scale^2
            # pad (1,1) -> [2H] (:799-807)
            # Weight-space FIR fusion (one 6x6 dilated conv instead of
            # conv+FIR) was built and measured in round 2: 237.7 ms/step vs
            # 202.7 at SG2-1024 bf16 — XLA lowers the wider dilated kernel
            # worse than it fuses the pair, so the two-op form stays.
            fir = setup_fir_kernel((1.0, 3.0, 3.0, 1.0))
            p = fir.shape[0] - 1 + (self.scale_factor - k)  # total FIR pad (:599-601)
            pad0, pad1 = (p + 1) // 2, p // 2
            y = jax.lax.conv_general_dilated(
                x,
                weight,
                window_strides=(1, 1),
                padding=((k - 1, k - 1), (k - 1, k - 1)),
                lhs_dilation=(self.scale_factor, self.scale_factor),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            y = upfirdn2d(y, fir, pad=(pad0, pad1), gain=float(self.scale_factor**2))
        elif k % 2 == 1 and use_s2d(x.shape[1], x.shape[2], self.in_channels):
            # lane-filling space-to-depth form of the SAME conv (opt-in,
            # TPUGAN_S2D=1; ops/s2d.py) — targets the 32-channel 1024²
            # stride-1 layer the b8 occupancy audit flagged
            y = conv_s2d(x, weight)
        else:
            y = jax.lax.conv_general_dilated(
                x,
                weight,
                window_strides=(1, 1),
                padding=((k // 2, k // 2), (k // 2, k // 2)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        # selective-remat cut point (see nn/layers.py::EqConv)
        y = _checkpoint_name(y, "conv_out")

        if self.demodulate:
            y = y / norm[:, None, None, :]

        if self.add_noise:
            noise_buf = self.variable(
                "buffers", "noise",
                lambda: jax.random.normal(
                    jax.random.PRNGKey(0), (1, self.resolution, self.resolution, 1)
                ),
            ).value
            noise_strength = self.param("noise_strength", nn.initializers.zeros, ())
            if noise is None:
                if randomize_noise:
                    key = self.make_rng("noise")
                    noise = jax.random.normal(
                        key, (y.shape[0], self.resolution, self.resolution, 1)
                    )
                else:
                    noise = noise_buf
            y = y + noise.astype(y.dtype) * noise_strength

        if self.add_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            y = y + bias * self.lr_mul
        return _activate(y, self.activation_type), style


class SG2ConvBlock(nn.Module):
    """Plain wscale conv (resnet skip branch), ConvBlock (:635-739)."""

    in_channels: int
    out_channels: int
    kernel_size: int = 3
    add_bias: bool = True
    scale_factor: int = 1
    lr_mul: float = 1.0
    activation_type: str = "lrelu"

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        fan_in = k * k * self.in_channels
        wscale = _WSCALE_GAIN / math.sqrt(fan_in) * self.lr_mul
        weight = self.param(
            "weight", nn.initializers.normal(stddev=1.0 / self.lr_mul),
            (k, k, self.in_channels, self.out_channels),
        )
        weight = weight * wscale
        if self.scale_factor > 1:
            # pre-flip in the reference (:725) cancels the transpose flip
            y = jax.lax.conv_general_dilated(
                x, weight,
                window_strides=(1, 1),
                padding=((k - 1, k - 1), (k - 1, k - 1)),
                lhs_dilation=(self.scale_factor, self.scale_factor),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            fir = setup_fir_kernel((1.0, 3.0, 3.0, 1.0))
            p = fir.shape[0] - 1 + (self.scale_factor - k)
            y = upfirdn2d(
                y, fir, pad=((p + 1) // 2, p // 2), gain=float(self.scale_factor**2)
            )
        else:
            y = jax.lax.conv_general_dilated(
                x, weight,
                window_strides=(1, 1),
                padding=((k // 2, k // 2), (k // 2, k // 2)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        y = _checkpoint_name(y, "conv_out")
        if self.add_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            y = y + bias * self.lr_mul
        return _activate(y, self.activation_type)


class SG2Synthesis(nn.Module):
    """SynthesisModule (:336-539)."""

    resolution: int = 1024
    init_res: int = _INIT_RES
    w_space_dim: int = 512
    image_channels: int = 3
    final_tanh: bool = False
    const_input: bool = True
    architecture: str = "skip"
    demodulate: bool = True
    fmaps_base: int = 32 << 10
    fmaps_max: int = 512

    def get_nf(self, res):
        return min(self.fmaps_base // res, self.fmaps_max)

    @property
    def num_layers(self):
        return (
            int(math.log2(self.resolution)) - int(math.log2(self.init_res)) + 1
        ) * 2

    @nn.compact
    def __call__(self, wp, randomize_noise: bool = False):
        if wp.ndim != 3 or wp.shape[1:] != (self.num_layers, self.w_space_dim):
            raise ValueError(
                f"wp must be [batch, {self.num_layers}, {self.w_space_dim}], got {wp.shape}"
            )
        init_log2 = int(math.log2(self.init_res))
        final_log2 = int(math.log2(self.resolution))
        results = {"wp": wp}

        if self.const_input:
            const = self.param(
                "const", nn.initializers.normal(stddev=1.0),
                (1, self.init_res, self.init_res, self.get_nf(self.init_res)),
            )
            x = jnp.repeat(const, wp.shape[0], axis=0)
        else:
            x = SG2Dense(
                self.get_nf(self.init_res) * self.init_res * self.init_res,
                name="early_layer",
            )(wp[:, 0])
            x = x.reshape(-1, self.init_res, self.init_res, self.get_nf(self.init_res))

        def conv_layer(idx, res, in_ch, out_ch, up):
            return ModulatedConv(
                in_channels=in_ch, out_channels=out_ch, resolution=res,
                w_space_dim=self.w_space_dim,
                scale_factor=2 if up else 1,
                demodulate=self.demodulate,
                name=f"layer{idx}",
            )

        def output_layer(block_idx, res, in_ch):
            return ModulatedConv(
                in_channels=in_ch, out_channels=self.image_channels, resolution=res,
                w_space_dim=self.w_space_dim, kernel_size=1, demodulate=False,
                add_noise=False, activation_type="linear",
                name=f"output{block_idx}",
            )

        image = None
        fir = setup_fir_kernel((1.0, 3.0, 3.0, 1.0))
        if self.architecture in ("skip", "origin"):
            layer_idx = 0
            for res_log2 in range(init_log2, final_log2 + 1):
                res = 2**res_log2
                block_idx = res_log2 - init_log2
                if res > self.init_res:
                    x, style = conv_layer(
                        2 * block_idx - 1, res, self.get_nf(res // 2), self.get_nf(res), True
                    )(x, wp[:, 2 * block_idx - 1], randomize_noise)
                    results[f"style{2 * block_idx - 1:02d}"] = style
                x, style = conv_layer(
                    2 * block_idx, res, self.get_nf(res), self.get_nf(res), False
                )(x, wp[:, 2 * block_idx], randomize_noise)
                results[f"style{2 * block_idx:02d}"] = style
                if res_log2 == final_log2 or self.architecture == "skip":
                    temp, style = output_layer(block_idx, res, self.get_nf(res))(
                        x, wp[:, 2 * block_idx + 1]
                    )
                    results[f"output_style{block_idx}"] = style
                    if image is None:
                        image = temp
                    elif self.architecture == "skip":
                        image = temp + upfirdn2d(
                            image, fir, up=2, pad=(2, 1), gain=4.0
                        )
                    else:
                        image = temp
        elif self.architecture == "resnet":
            x, style = conv_layer(0, self.init_res, self.get_nf(self.init_res), self.get_nf(self.init_res), False)(
                x, wp[:, 0], randomize_noise
            )
            results["style00"] = style
            layer_idx = 1
            for res_log2 in range(init_log2 + 1, final_log2 + 1):
                res = 2**res_log2
                residual = SG2ConvBlock(
                    in_channels=self.get_nf(res // 2), out_channels=self.get_nf(res),
                    kernel_size=1, add_bias=False, scale_factor=2,
                    activation_type="linear", name=f"skip_layer{layer_idx // 2}",
                )(x)
                x, style = conv_layer(layer_idx, res, self.get_nf(res // 2), self.get_nf(res), True)(
                    x, wp[:, layer_idx], randomize_noise
                )
                results[f"style{layer_idx:02d}"] = style
                x, style = conv_layer(layer_idx + 1, res, self.get_nf(res), self.get_nf(res), False)(
                    x, wp[:, layer_idx + 1], randomize_noise
                )
                results[f"style{layer_idx + 1:02d}"] = style
                x = (x + residual) / math.sqrt(2.0)
                layer_idx += 2
            block_idx = final_log2 - init_log2
            image, style = output_layer(block_idx, self.resolution, self.get_nf(self.resolution))(
                x, wp[:, layer_idx]
            )
            results[f"output_style{block_idx}"] = style
        else:
            raise ValueError(f"architecture: {self.architecture}")

        results["image"] = jnp.tanh(image) if self.final_tanh else image
        return results


class StyleGAN2Generator(nn.Module):
    """Full generator (:35-196): mapping -> truncation -> synthesis.

    Used frozen for encoder training; training-mode w_avg EMA / style
    mixing live in :func:`update_w_avg` and the training loop (functional,
    not hidden module state).
    """

    resolution: int = 1024
    z_space_dim: int = 512
    w_space_dim: int = 512
    label_size: int = 0
    mapping_layers: int = 8
    mapping_fmaps: int = 512
    mapping_lr_mul: float = 0.01
    repeat_w: bool = True
    image_channels: int = 3
    final_tanh: bool = False
    const_input: bool = True
    architecture: str = "skip"
    demodulate: bool = True
    fmaps_base: int = 32 << 10
    fmaps_max: int = 512

    @property
    def num_layers(self):
        return int(math.log2(self.resolution // _INIT_RES * 2)) * 2

    def setup(self):
        self.mapping = SG2Mapping(
            input_space_dim=self.z_space_dim,
            hidden_space_dim=self.mapping_fmaps,
            final_space_dim=(
                self.w_space_dim if self.repeat_w else self.w_space_dim * self.num_layers
            ),
            label_size=self.label_size,
            num_layers=self.mapping_layers,
            lr_mul=self.mapping_lr_mul,
        )
        self.truncation = SG2Truncation(
            w_space_dim=self.w_space_dim, num_layers=self.num_layers, repeat_w=self.repeat_w
        )
        self.synthesis = SG2Synthesis(
            resolution=self.resolution,
            w_space_dim=self.w_space_dim,
            image_channels=self.image_channels,
            final_tanh=self.final_tanh,
            const_input=self.const_input,
            architecture=self.architecture,
            demodulate=self.demodulate,
            fmaps_base=self.fmaps_base,
            fmaps_max=self.fmaps_max,
        )

    def __call__(
        self,
        z,
        label=None,
        trunc_psi=None,
        trunc_layers=None,
        randomize_noise: bool = False,
    ):
        mapping_results = self.mapping(z, label)
        w = mapping_results["w"]
        wp = self.truncation(w, trunc_psi, trunc_layers)
        synthesis_results = self.synthesis(wp, randomize_noise)
        return {**mapping_results, **synthesis_results}

    def synthesize(self, wp, randomize_noise: bool = False):
        """Run synthesis only (the reference's ``generator.synthesis(w2)``)."""
        return self.synthesis(wp, randomize_noise)
