"""Unit tests for tpugan.ops against torch (CPU) reference semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from tpugan import ops


def to_nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


def from_nchw(x):
    return np.transpose(x, (0, 2, 3, 1))


def test_pixel_norm_matches_torch(rng):
    x = rng.randn(2, 4, 4, 8).astype(np.float32)
    xt = torch.from_numpy(to_nchw(x))
    ref = xt * torch.rsqrt(torch.mean(xt.pow(2.0), dim=1, keepdim=True) + 1e-8)
    got = ops.pixel_norm(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), from_nchw(ref.numpy()), rtol=1e-5, atol=1e-6)


def test_style_mod_matches_torch(rng):
    n, c = 3, 8
    x = rng.randn(n, 5, 5, c).astype(np.float32)
    style = rng.randn(n, 2 * c).astype(np.float32)
    xt = torch.from_numpy(to_nchw(x))
    st = torch.from_numpy(style).view(n, 2, c, 1, 1)
    ref = st[:, 1] + xt * (st[:, 0] + 1)
    got = ops.style_mod(jnp.asarray(x), jnp.asarray(style))
    np.testing.assert_allclose(np.asarray(got), from_nchw(ref.numpy()), rtol=1e-5, atol=1e-6)


def test_up_down_scale(rng):
    x = rng.randn(2, 4, 6, 3).astype(np.float32)
    up = ops.upscale2d(jnp.asarray(x))
    ref_up = F.interpolate(torch.from_numpy(to_nchw(x)), scale_factor=2, mode="nearest")
    np.testing.assert_allclose(np.asarray(up), from_nchw(ref_up.numpy()), atol=1e-6)

    down = ops.downscale2d(jnp.asarray(x))
    ref_down = F.avg_pool2d(torch.from_numpy(to_nchw(x)), 2, 2)
    np.testing.assert_allclose(np.asarray(down), from_nchw(ref_down.numpy()), rtol=1e-5, atol=1e-6)


def test_instance_norm_matches_torch(rng):
    x = rng.randn(2, 7, 7, 5).astype(np.float32)
    inorm = torch.nn.InstanceNorm2d(5, affine=False, eps=1e-8)
    ref = inorm(torch.from_numpy(to_nchw(x)))
    got = ops.instance_norm(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), from_nchw(ref.numpy()), rtol=1e-4, atol=1e-5)


def test_minibatch_stddev_matches_torch(rng):
    x = rng.randn(6, 4, 4, 3).astype(np.float32)
    xt = torch.from_numpy(to_nchw(x))
    # reference implementation (net.py:60-69)
    group_size = min(4, xt.shape[0])
    size = xt.shape[0]
    xt2 = torch.cat([xt, xt[: (group_size - (xt.shape[0] % group_size)) % group_size]])
    y = xt2.view(group_size, -1, xt2.shape[1], xt2.shape[2], xt2.shape[3])
    y = y - y.mean(dim=0, keepdim=True)
    y = torch.sqrt((y**2).mean(dim=0) + 1e-8).mean(dim=[1, 2, 3], keepdim=True)
    y = y.repeat(group_size, 1, xt2.shape[2], xt2.shape[3])
    ref = torch.cat([xt2, y], dim=1)[:size]
    got = ops.minibatch_stddev(jnp.asarray(x), group_size=4)
    np.testing.assert_allclose(np.asarray(got), from_nchw(ref.numpy()), rtol=1e-5, atol=1e-6)


def test_blur3x3_matches_reference_blur(rng):
    c = 6
    x = rng.randn(2, 8, 8, c).astype(np.float32)
    f = np.array([1, 2, 1], dtype=np.float32)
    k = np.outer(f, f)
    k /= k.sum()
    weight = torch.from_numpy(np.tile(k[None, None], (c, 1, 1, 1)))
    ref = F.conv2d(torch.from_numpy(to_nchw(x)), weight, groups=c, padding=1)
    got = ops.blur3x3(jnp.asarray(x), use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), from_nchw(ref.numpy()), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("up,down,taps", [(1, 1, (1, 2, 1)), (2, 1, (1, 3, 3, 1)), (1, 2, (1, 3, 3, 1))])
def test_upfirdn_shapes(rng, up, down, taps):
    from tpugan.ops.upfirdn import upsample_fir, downsample_fir, setup_fir_kernel

    x = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    k = setup_fir_kernel(taps)
    if up == 2:
        y = upsample_fir(x, k, use_pallas=False)
        assert y.shape == (2, 16, 16, 4)
    elif down == 2:
        y = downsample_fir(x, k, use_pallas=False)
        assert y.shape == (2, 4, 4, 4)
    else:
        y = ops.upfirdn2d(x, k, pad=(1, 1), use_pallas=False)
        assert y.shape == x.shape


def test_upsample_fir_matches_torch_zero_stuff(rng):
    """upsample_fir == zero-stuff x2 then FIR with gain 4 (SG2 semantics)."""
    from tpugan.ops.upfirdn import upsample_fir, setup_fir_kernel

    x = rng.randn(1, 6, 6, 2).astype(np.float32)
    k = np.array([1.0, 3.0, 3.0, 1.0], dtype=np.float32)
    k2 = np.outer(k, k)
    k2 /= k2.sum()

    xt = torch.from_numpy(to_nchw(x))
    n, c, h, w = xt.shape
    stuffed = torch.zeros(n, c, h * 2, w * 2)
    stuffed[:, :, ::2, ::2] = xt
    kh = 4
    p = kh - 2
    pad0, pad1 = (p + 1) // 2 + 1, p // 2
    weight = torch.from_numpy(np.tile(k2[None, None] * 4.0, (c, 1, 1, 1)))
    ref = F.conv2d(F.pad(stuffed, (pad0, pad1, pad0, pad1)), weight, groups=c)

    got = upsample_fir(jnp.asarray(x), jnp.asarray(setup_fir_kernel(k)), use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), from_nchw(ref.numpy()), rtol=1e-4, atol=1e-5)


def test_noise_inject(rng):
    x = jnp.asarray(rng.randn(2, 4, 4, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(3).astype(np.float32))
    noise = jnp.asarray(rng.randn(2, 4, 4, 1).astype(np.float32))
    got = ops.noise_inject(x, w, key=None, noise=noise)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x + w * noise), rtol=1e-6)
    # no key, no noise -> identity
    np.testing.assert_allclose(np.asarray(ops.noise_inject(x, w, None)), np.asarray(x))


@pytest.mark.parametrize(
    "up,down,taps,pad",
    [
        (1, 1, (1, 2, 1), (1, 1)),
        (2, 1, (1, 3, 3, 1), (2, 1)),
        (1, 2, (1, 3, 3, 1), (1, 1)),
        (1, 1, (1, 3, 3, 1), (2, 1)),
    ],
)
def test_upfirdn_custom_vjp_matches_xla_autodiff(rng, up, down, taps, pad):
    """The hand-derived adjoint must equal XLA's autodiff of the conv form."""
    from tpugan.ops.upfirdn import _upfirdn2d_xla, setup_fir_kernel

    x = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    k = setup_fir_kernel(taps)

    def f_custom(x):
        return jnp.sum(jnp.sin(ops.upfirdn2d(x, k, up=up, down=down, pad=pad, use_pallas=False)))

    def f_auto(x):
        return jnp.sum(jnp.sin(_upfirdn2d_xla(x, k, up, down, pad, 1.0)))

    g_custom = jax.grad(f_custom)(x)
    g_auto = jax.grad(f_auto)(x)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_auto), rtol=1e-4, atol=1e-5)
