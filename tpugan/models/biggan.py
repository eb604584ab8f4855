"""BigGAN-deep generator (HuggingFace-style) — flax/NHWC.

TPU-native rebuild of /root/reference/model/biggan_generator.py and
model/utils/biggan_config.py:
  * ``BigGANConfig``    <- biggan_config.py:11-71 (same JSON schema)
  * ``SelfAttn``        <- biggan_generator.py:58-97 (SAGAN attention)
  * ``BigGANBatchNorm`` <- :100-150 (truncation-interpolated stats +
    conditional scale/offset)
  * ``GenBlock``        <- :153-203 (4-conv bottleneck, channel-drop skip)
  * ``BigGANGenerator`` <- Generator :205-256
  * ``BigGAN``          <- BigGAN :258-304; forward(z, label, truncation)
    -> (image, cond_vector)

Spectral norm is inference-only in the reference (the generator is always
frozen); checkpoints are converted by folding sigma into the weights
(``tpugan.io.convert.fold_spectral_norm``), so the modules here are plain
convs/linears. The reference's TF-compat reshape dance (:237-239) vanishes:
gen_z already produces NHWC. ``truncation`` is a static python float, so
the n_stats interpolation (:129-136) resolves at trace time.
"""

from __future__ import annotations

import dataclasses
import json
import math
from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpugan.ops.basic import upscale2d


@dataclasses.dataclass
class BigGANConfig:
    """Same schema as the reference JSON config (biggan_config.py:16-44).

    ``layers`` tuples are (up_sample?, in_mul, out_mul)."""

    output_dim: int = 128
    z_dim: int = 128
    class_embed_dim: int = 128
    channel_width: int = 128
    num_classes: int = 1000
    layers: List[Tuple[bool, int, int]] = dataclasses.field(
        default_factory=lambda: [
            (False, 16, 16), (True, 16, 16), (False, 16, 16), (True, 16, 8),
            (False, 8, 8), (True, 8, 4), (False, 4, 4), (True, 4, 2),
            (False, 2, 2), (True, 2, 1),
        ]
    )
    attention_layer_position: int = 8
    eps: float = 1e-4
    n_stats: int = 51

    @classmethod
    def from_json_file(cls, path) -> "BigGANConfig":
        with open(path, "r", encoding="utf-8") as f:
            d = json.load(f)
        cfg = cls()
        for k, v in d.items():
            if k == "layers":
                v = [tuple(t) for t in v]
            setattr(cfg, k, v)
        return cfg

    def to_json_string(self) -> str:
        d = dataclasses.asdict(self)
        d["layers"] = [list(t) for t in d["layers"]]
        return json.dumps(d, indent=2, sort_keys=True) + "\n"

    @property
    def hashable_layers(self):
        return tuple(tuple(t) for t in self.layers)

    @classmethod
    def for_resolution(cls, output_dim: int, **kw) -> "BigGANConfig":
        """Zoo layer layouts for the three biggan-deep checkpoints the
        reference's from_pretrained map covers (biggan_file_utils zoo,
        biggan_generator.py:33-46): 128 (the dataclass default), 256, 512.
        The JSON config shipped with each checkpoint is authoritative;
        this preset lets ``--mtype 4`` run without ``--config_dir``."""
        layouts = {
            128: [(False, 16, 16), (True, 16, 16), (False, 16, 16), (True, 16, 8),
                  (False, 8, 8), (True, 8, 4), (False, 4, 4), (True, 4, 2),
                  (False, 2, 2), (True, 2, 1)],
            256: [(False, 16, 16), (True, 16, 16), (False, 16, 16), (True, 16, 8),
                  (False, 8, 8), (True, 8, 8), (False, 8, 8), (True, 8, 4),
                  (False, 4, 4), (True, 4, 2), (False, 2, 2), (True, 2, 1)],
            512: [(False, 16, 16), (True, 16, 16), (False, 16, 16), (True, 16, 8),
                  (False, 8, 8), (True, 8, 8), (False, 8, 8), (True, 8, 4),
                  (False, 4, 4), (True, 4, 2), (False, 2, 2), (True, 2, 1),
                  (False, 1, 1), (True, 1, 1)],
        }
        if output_dim not in layouts:
            raise ValueError(
                f"no biggan-deep zoo layout for {output_dim}; pass --config_dir "
                "with the checkpoint's JSON config (choices: 128/256/512)"
            )
        return cls(output_dim=output_dim, layers=layouts[output_dim], **kw)


class SelfAttn(nn.Module):
    """SAGAN self-attention (:58-97): theta/phi(pooled)/g(pooled)/o 1x1
    convs, softmax((h*w) x (h*w/4)) scores, gamma-gated residual."""

    in_channels: int

    @nn.compact
    def __call__(self, x):
        n, h, w, ch = x.shape
        assert ch == self.in_channels

        def conv1x1(features, name):
            return nn.Conv(features, (1, 1), use_bias=False, name=name)

        theta = conv1x1(ch // 8, "snconv1x1_theta")(x).reshape(n, h * w, ch // 8)
        phi = conv1x1(ch // 8, "snconv1x1_phi")(x)
        phi = nn.max_pool(phi, (2, 2), strides=(2, 2)).reshape(n, h * w // 4, ch // 8)
        g = conv1x1(ch // 2, "snconv1x1_g")(x)
        g = nn.max_pool(g, (2, 2), strides=(2, 2)).reshape(n, h * w // 4, ch // 2)
        # blockwise attention: the (h*w) x (h*w/4) score matrix never
        # materialises in HBM (tpugan.ops.attention, Pallas on TPU)
        from tpugan.ops.attention import sagan_attention

        attn_g = sagan_attention(theta, phi, g)
        attn_g = attn_g.reshape(n, h, w, ch // 2)
        attn_g = conv1x1(ch, "snconv1x1_o_conv")(attn_g)
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        return x + gamma * attn_g


class BigGANBatchNorm(nn.Module):
    """Class-conditional BN with truncation-interpolated running stats
    (:100-150). ``truncation`` static; buffers in collection ``buffers``."""

    num_features: int
    condition_vector_dim: Optional[int] = None
    n_stats: int = 51
    eps: float = 1e-4
    conditional: bool = True
    sn: bool = False  # live spectral norm (trainable E_BIG); generator
    # checkpoints have sigma folded at conversion, so default is plain Dense

    @nn.compact
    def __call__(self, x, truncation: float, condition_vector=None):
        running_means = self.variable(
            "buffers", "running_means", lambda: jnp.zeros((self.n_stats, self.num_features))
        ).value
        running_vars = self.variable(
            "buffers", "running_vars", lambda: jnp.ones((self.n_stats, self.num_features))
        ).value

        step_size = 1.0 / (self.n_stats - 1)
        coef, start_idx = math.modf(truncation / step_size)
        start_idx = int(start_idx)
        if coef != 0.0:  # reference's (reversed-looking) interpolation :131-133
            mean = running_means[start_idx] * coef + running_means[start_idx + 1] * (1 - coef)
            var = running_vars[start_idx] * coef + running_vars[start_idx + 1] * (1 - coef)
        else:
            mean = running_means[start_idx]
            var = running_vars[start_idx]
        # buffers stay fp32; cast the stats so bf16 activations don't
        # promote back to fp32 (the interp itself is constant folding)
        mean = mean.astype(x.dtype)
        var = var.astype(x.dtype)

        if self.conditional:
            assert condition_vector is not None
            if self.sn:
                from tpugan.nn.spectral import SNDense

                dense = lambda name: SNDense(self.num_features, use_bias=False, name=name)
            else:
                dense = lambda name: nn.Dense(self.num_features, use_bias=False, name=name)
            scale = dense("scale")(condition_vector)
            offset = dense("offset")(condition_vector)
            weight = 1.0 + scale[:, None, None, :]
            bias = offset[:, None, None, :]
            return (x - mean) / jnp.sqrt(var + self.eps) * weight + bias
        weight = self.param("weight", nn.initializers.ones, (self.num_features,))
        bias = self.param("bias", nn.initializers.zeros, (self.num_features,))
        return (x - mean) / jnp.sqrt(var + self.eps) * weight + bias


class GenBlock(nn.Module):
    """Bottleneck block (:153-203), reduction 4, optional 2x upsample,
    channel-drop residual."""

    in_size: int
    out_size: int
    condition_vector_dim: int
    reduction_factor: int = 4
    up_sample: bool = False
    n_stats: int = 51
    eps: float = 1e-4

    @nn.compact
    def __call__(self, x, cond_vector, truncation: float):
        middle = self.in_size // self.reduction_factor
        x0 = x

        def bn(features, name):
            return BigGANBatchNorm(
                features, self.condition_vector_dim, n_stats=self.n_stats,
                eps=self.eps, conditional=True, name=name,
            )

        x = bn(self.in_size, "bn_0")(x, truncation, cond_vector)
        x = nn.relu(x)
        x = nn.Conv(middle, (1, 1), name="conv_0")(x)

        x = bn(middle, "bn_1")(x, truncation, cond_vector)
        x = nn.relu(x)
        if self.up_sample:
            x = upscale2d(x)
        x = nn.Conv(middle, (3, 3), padding=1, name="conv_1")(x)

        x = bn(middle, "bn_2")(x, truncation, cond_vector)
        x = nn.relu(x)
        x = nn.Conv(middle, (3, 3), padding=1, name="conv_2")(x)

        x = bn(middle, "bn_3")(x, truncation, cond_vector)
        x = nn.relu(x)
        x = nn.Conv(self.out_size, (1, 1), name="conv_3")(x)

        if self.in_size != self.out_size:
            x0 = x0[..., : x0.shape[-1] // 2]
        if self.up_sample:
            x0 = upscale2d(x0)
        return x + x0


class BigGANGenerator(nn.Module):
    """Generator (:205-256). cond_vector [N, 2*z_dim] -> image NHWC [-1,1]."""

    config: BigGANConfig

    @nn.compact
    def __call__(self, cond_vector, truncation: float):
        cfg = self.config
        ch = cfg.channel_width
        cvd = cfg.z_dim * 2

        z = nn.Dense(4 * 4 * 16 * ch, name="gen_z")(cond_vector)
        # TF NHWC reshape (:237-239) — native here
        x = z.reshape(-1, 4, 4, 16 * ch)

        idx = 0
        for i, layer in enumerate(cfg.layers):
            if i == cfg.attention_layer_position:
                x = SelfAttn(ch * layer[1], name=f"layers_{idx}")(x)
                idx += 1
            x = GenBlock(
                ch * layer[1], ch * layer[2], cvd,
                up_sample=layer[0], n_stats=cfg.n_stats, eps=cfg.eps,
                name=f"layers_{idx}",
            )(x, cond_vector, truncation)
            idx += 1

        x = BigGANBatchNorm(ch, n_stats=cfg.n_stats, eps=cfg.eps, conditional=False, name="bn")(
            x, truncation
        )
        x = nn.relu(x)
        x = nn.Conv(ch, (3, 3), padding=1, name="conv_to_rgb")(x)
        # The reference keeps a ch-wide to-rgb conv and takes the first 3
        # channels (:253). Without the barrier XLA sinks the slice INTO the
        # convolution, lowering it as a 3-output-channel conv that uses 3
        # of the MXU's 128 lanes — measured +5 ms fp32 and +120 ms bf16
        # (2,1)-packed at 512x512 on v5e. The identity barrier keeps the
        # conv at 128 lanes; the slice then costs one cheap copy.
        # (512 fwd: bf16 136 -> 15.6 ms, fp32 24.7 -> 20.0 ms.)
        x = jax.lax.optimization_barrier(x)
        x = x[..., :3]
        return jnp.tanh(x)


class BigGAN(nn.Module):
    """Wrapper (:258-304): class embedding (no bias) + generator.

    forward(z [N, z_dim], class_label one-hot [N, num_classes],
    truncation) -> (image, cond_vector).
    """

    config: BigGANConfig

    @nn.compact
    def __call__(self, z, class_label, truncation: float):
        assert 0 < truncation <= 1
        # the one-hot label follows z's dtype so bf16 compute does not
        # promote the cond_vector back to fp32
        embed = nn.Dense(self.config.z_dim, use_bias=False, name="embeddings")(
            class_label.astype(z.dtype)
        )
        cond_vector = jnp.concatenate([z, embed], axis=1)
        image = BigGANGenerator(self.config, name="generator")(cond_vector, truncation)
        return image, cond_vector
