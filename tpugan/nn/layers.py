"""Equalized-learning-rate flax layers (NHWC).

TPU-native counterparts of the reference lreq layers
(model/utils/lreq.py:39-175). The "implicit lreq" scheme is kept: weights
are stored at their working scale (init std = gain/sqrt(fan_in)) and the
optimizer scales each parameter's step by its equalization coefficient. The
coefficients live in a dedicated ``lreq`` variable collection (leaf
``<param>_coef``) that ``tpugan.optim.lreq_adam`` consumes — the functional
equivalent of the reference's ``lr_equalization_coef`` attribute tag
(lreq.py:58-60) feeding LREQAdam (custom_adam.py:71-74).
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name as _checkpoint_name

from tpugan.ops.eq_lr import eq_lr_std, transform_kernel_2d
from tpugan.ops.s2d import conv_s2d, conv_s2d_stride2, use_s2d


def _pair(x) -> tuple[int, int]:
    if isinstance(x, Sequence):
        return tuple(x)  # type: ignore[return-value]
    return (x, x)


class EqLinear(nn.Module):
    """Dense layer with equalized LR (reference lreq.Linear, lreq.py:39-75).

    kernel: [in, out], init N(0, (gain/sqrt(in))); bias zeros.
    """

    features: int
    use_bias: bool = True
    gain: float = math.sqrt(2.0)
    lrmul: float = 1.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_features = x.shape[-1]
        std = eq_lr_std(in_features, self.gain, self.lrmul)
        kernel = self.param(
            "kernel",
            nn.initializers.normal(stddev=std / self.lrmul),
            (in_features, self.features),
        )
        if self.is_initializing():
            self.variable("lreq", "kernel_coef", lambda: jnp.float32(std))
        y = x @ kernel
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            if self.is_initializing():
                self.variable("lreq", "bias_coef", lambda: jnp.float32(self.lrmul))
            y = y + bias
        return y


class EqConv(nn.Module):
    """2-D (transposed) convolution with equalized LR, NHWC.

    Mirrors reference lreq.Conv2d / ConvTranspose2d (lreq.py:78-175):
    fan_in = kh*kw*in/groups, optional ``transform_kernel`` 4-tap smoothing
    for fused-scale resampling. Weight layout is HWIO [kh, kw, in/groups,
    out] for both directions; the transpose path runs as an lhs-dilated
    conv with flipped taps (identical numerics to torch conv_transpose2d).
    """

    features: int
    kernel_size: int | tuple[int, int] = 3
    stride: int | tuple[int, int] = 1
    padding: int | tuple[int, int] = 0
    groups: int = 1
    use_bias: bool = True
    gain: float = math.sqrt(2.0)
    lrmul: float = 1.0
    transpose: bool = False
    transform_kernel: bool = False

    @nn.compact
    def __call__(
        self, x: jax.Array, s2d_in: bool = False, s2d_out: bool = False
    ) -> jax.Array:
        # s2d_in/s2d_out: the input/output stays in space-to-depth domain
        # (ops/s2d.py) — parameters are IDENTICAL to the normal path, only
        # the compute is phase-expanded, so checkpoints are unaffected.
        in_features = x.shape[-1] // (4 if s2d_in else 1)
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.stride)
        ph, pw = _pair(self.padding)
        fan_in = kh * kw * in_features // self.groups
        std = eq_lr_std(fan_in, self.gain, self.lrmul)
        kernel = self.param(
            "kernel",
            nn.initializers.normal(stddev=std / self.lrmul),
            (kh, kw, in_features // self.groups, self.features),
        )
        if self.is_initializing():
            self.variable("lreq", "kernel_coef", lambda: jnp.float32(std))

        w = kernel
        if self.transform_kernel:
            # forward convs average (x0.25); transposed convs keep the sum
            # (lreq.py:129-131 vs :145-147)
            w = transform_kernel_2d(w, average=not self.transpose)
            kh, kw = kh + 1, kw + 1

        if self.transpose:
            w = jnp.flip(w, axis=(0, 1))
            y = jax.lax.conv_general_dilated(
                x,
                w,
                window_strides=(1, 1),
                padding=((kh - 1 - ph, kh - 1 - ph), (kw - 1 - pw, kw - 1 - pw)),
                lhs_dilation=(sh, sw),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.groups,
            )
        elif s2d_in or s2d_out:
            # explicit S2D-domain call from a chained block
            # (models/encoders.py): stride-1 convs stay in domain,
            # stride-2 (fused-scale) convs consume the domain and exit at
            # the block grid
            if (sh, sw) == (1, 1):
                assert self.groups == 1 and kh == kw and kh % 2 == 1
                y = conv_s2d(x, w, in_s2d=s2d_in, out_s2d=s2d_out)
            else:
                assert (sh, sw) == (2, 2) and self.groups == 1 and not s2d_out
                y = conv_s2d_stride2(x, w, pad=ph, in_s2d=s2d_in)
        elif (
            (sh, sw) == (1, 1)
            and self.groups == 1
            and kh == kw
            and kh % 2 == 1
            and (ph, pw) == (kh // 2, kw // 2)
            and use_s2d(x.shape[1], x.shape[2], in_features)
        ):
            # lane-filling space-to-depth form of the SAME conv (opt-in,
            # TPUGAN_S2D=1; see ops/s2d.py for the exactness argument and
            # the measured dispatch policy)
            y = conv_s2d(x, w)
        else:
            y = jax.lax.conv_general_dilated(
                x,
                w,
                window_strides=(sh, sw),
                padding=((ph, ph), (pw, pw)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.groups,
            )
        # named cut point for the selective remat policy ("conv_outs"):
        # save conv outputs only, recompute the elementwise chains the
        # backward re-reads (no-op outside jax.checkpoint)
        y = _checkpoint_name(y, "conv_out")
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            if self.is_initializing():
                self.variable("lreq", "bias_coef", lambda: jnp.float32(self.lrmul))
            y = y + (jnp.tile(bias, 4) if s2d_out else bias)
        return y
