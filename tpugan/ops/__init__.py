from tpugan.ops.basic import (
    pixel_norm,
    style_mod,
    upscale2d,
    downscale2d,
    instance_norm,
    instance_moments,
    minibatch_stddev,
    leaky_relu,
    noise_inject,
)
from tpugan.ops.upfirdn import upfirdn2d, blur3x3, setup_fir_kernel
from tpugan.ops.eq_lr import eq_lr_std, transform_kernel_2d

__all__ = [
    "pixel_norm",
    "style_mod",
    "upscale2d",
    "downscale2d",
    "instance_norm",
    "instance_moments",
    "minibatch_stddev",
    "leaky_relu",
    "noise_inject",
    "upfirdn2d",
    "blur3x3",
    "setup_fir_kernel",
    "eq_lr_std",
    "transform_kernel_2d",
]
