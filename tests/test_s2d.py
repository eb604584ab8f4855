"""Space-to-depth conv transform (ops/s2d.py): exactness vs direct conv.

The transform re-expresses a stride-1 "same" conv on (H, W, C) as a conv
on (H/2, W/2, 4C) with an expanded sparse kernel — same dot products with
structural zeros added, so the gates here are fp-ulp tight, not
approximate-parity loose.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpugan.ops.s2d import (
    conv_s2d,
    depth_to_space,
    expand_kernel_s2d,
    space_to_depth,
)


def _direct(x, w):
    k = w.shape[0]
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((k // 2, k // 2),) * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def test_s2d_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 12, 6))
    y = space_to_depth(x, 2)
    assert y.shape == (2, 4, 6, 24)
    assert (depth_to_space(y, 2) == x).all()


def test_s2d_channel_order():
    # channel index is (ry, rx, c): block-row major, then block-col, then c
    x = jnp.arange(2 * 2 * 3, dtype=jnp.float32).reshape(1, 2, 2, 3)
    y = space_to_depth(x, 2)[0, 0, 0]
    np.testing.assert_array_equal(
        np.asarray(y), np.asarray(x).reshape(4, 3).reshape(-1)
    )


@pytest.mark.parametrize(
    "h,w,c,k,ks",
    [
        (16, 16, 16, 16, 3),   # the SG2-1024 top-layer shape class
        (8, 12, 5, 7, 3),      # non-square, odd channels
        (16, 16, 16, 3, 1),    # ToRGB-style 1x1
        (12, 12, 4, 4, 5),     # wider kernel
    ],
)
def test_conv_s2d_matches_direct(h, w, c, k, ks):
    x = jax.random.normal(jax.random.PRNGKey(1), (2, h, w, c))
    wt = jax.random.normal(jax.random.PRNGKey(2), (ks, ks, c, k))
    wt = wt / np.sqrt(ks * ks * c)
    ref = _direct(x, wt)
    got = conv_s2d(x, wt)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_conv_s2d_domain_chaining():
    # keeping activations in S2D domain across a two-conv chain is exact
    c = 8
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16, c))
    w1 = jax.random.normal(jax.random.PRNGKey(4), (3, 3, c, c)) / np.sqrt(9 * c)
    w2 = jax.random.normal(jax.random.PRNGKey(5), (3, 3, c, c)) / np.sqrt(9 * c)
    ref = _direct(jax.nn.leaky_relu(_direct(x, w1), 0.2), w2)

    h = conv_s2d(x, w1, in_s2d=False, out_s2d=True)
    h = jax.nn.leaky_relu(h, 0.2)  # elementwise ops commute with S2D
    got = conv_s2d(h, w2, in_s2d=True, out_s2d=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_conv_s2d_gradients_match():
    c, k = 6, 5
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 8, 8, c))
    wt = jax.random.normal(jax.random.PRNGKey(7), (3, 3, c, k)) / np.sqrt(9 * c)

    def loss_direct(x, w):
        return jnp.sum(jnp.sin(_direct(x, w)))

    def loss_s2d(x, w):
        return jnp.sum(jnp.sin(conv_s2d(x, w)))

    gx_r, gw_r = jax.grad(loss_direct, argnums=(0, 1))(x, wt)
    gx_s, gw_s = jax.grad(loss_s2d, argnums=(0, 1))(x, wt)
    # the weight-grad reduces over all pixels, so accumulation order
    # differs between the two graphs: rel-tolerance, not exactness
    np.testing.assert_allclose(
        np.asarray(gx_s), np.asarray(gx_r), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(gw_s), np.asarray(gw_r), atol=1e-5, rtol=1e-5
    )


@pytest.mark.parametrize("ks,pad", [(4, 1), (3, 1), (2, 0)])
def test_conv_s2d_stride2_matches_direct(ks, pad):
    # the E_Blur fused-scale shapes: 4x4 pad-1 (transform_kernel), plus
    # odd/even variants
    from tpugan.ops.s2d import conv_s2d_stride2

    c, k = 6, 10
    x = jax.random.normal(jax.random.PRNGKey(20), (2, 16, 16, c))
    wt = jax.random.normal(jax.random.PRNGKey(21), (ks, ks, c, k))
    wt = wt / np.sqrt(ks * ks * c)
    ref = jax.lax.conv_general_dilated(
        x, wt, (2, 2), ((pad, pad),) * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    got = conv_s2d_stride2(x, wt, pad)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_blur3x3_s2d_matches():
    from tpugan.ops.s2d import blur3x3_s2d
    from tpugan.ops.upfirdn import blur3x3, setup_fir_kernel

    x = jax.random.normal(jax.random.PRNGKey(22), (2, 16, 16, 5))
    ref = blur3x3(x)
    got = depth_to_space(blur3x3_s2d(space_to_depth(x), setup_fir_kernel((1.0, 2.0, 1.0))))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_e_blur_top_chain_in_s2d_domain():
    # the full E_Blur top-block compute path stays in S2D domain:
    # conv3x3 -> lrelu -> blur -> stride-2 4x4 (transform_kernel), exact
    from tpugan.ops.s2d import blur3x3_s2d, conv_s2d_stride2
    from tpugan.ops.upfirdn import blur3x3, setup_fir_kernel

    c, cout = 8, 16
    x = jax.random.normal(jax.random.PRNGKey(23), (2, 16, 16, c))
    w1 = jax.random.normal(jax.random.PRNGKey(24), (3, 3, c, c)) / np.sqrt(9 * c)
    w2 = jax.random.normal(jax.random.PRNGKey(25), (4, 4, c, cout)) / np.sqrt(16 * c)

    h = jax.nn.leaky_relu(_direct(x, w1), 0.2)
    h = blur3x3(h)
    ref = jax.lax.conv_general_dilated(
        h, w2, (2, 2), ((1, 1),) * 2, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )

    hs = conv_s2d(x, w1, out_s2d=True)
    hs = jax.nn.leaky_relu(hs, 0.2)
    hs = blur3x3_s2d(hs, setup_fir_kernel((1.0, 2.0, 1.0)))
    got = conv_s2d_stride2(hs, w2, pad=1, in_s2d=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_eqconv_s2d_dispatch_matches(monkeypatch):
    # the EqConv integration: flag-on output == flag-off output
    from tpugan.nn.layers import EqConv

    conv = EqConv(8, 3, padding=1, use_bias=False)
    x = jax.random.normal(jax.random.PRNGKey(8), (2, 16, 16, 8))
    v = conv.init(jax.random.PRNGKey(9), x)
    ref = conv.apply(v, x)
    monkeypatch.setenv("TPUGAN_S2D", "1")
    monkeypatch.setenv("TPUGAN_S2D_MIN_H", "16")
    got = conv.apply(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_modulated_conv_s2d_dispatch_matches(monkeypatch):
    from tpugan.models.stylegan2 import ModulatedConv

    mc = ModulatedConv(in_channels=8, out_channels=8, resolution=16)
    x = jax.random.normal(jax.random.PRNGKey(10), (2, 16, 16, 8))
    w = jax.random.normal(jax.random.PRNGKey(11), (2, 32))
    v = mc.init({"params": jax.random.PRNGKey(12)}, x, w)
    ref, _ = mc.apply(v, x, w)
    monkeypatch.setenv("TPUGAN_S2D", "1")
    monkeypatch.setenv("TPUGAN_S2D_MIN_H", "16")
    got, _ = mc.apply(v, x, w)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5
    )


def test_encoder_block_s2d_domain_matches(monkeypatch):
    # the whole fused-scale E_Blur block in S2D domain == normal path
    # (same params, same rng draw; reassociation-level tolerance)
    from tpugan.models.encoders import Encoder

    enc = Encoder(startf=8, maxf=32, layer_count=3, latent_size=32, use_blur=True)
    x = jax.random.normal(jax.random.PRNGKey(30), (2, 16, 16, 3))
    v = enc.init({"params": jax.random.PRNGKey(31), "noise": jax.random.PRNGKey(32)}, x)
    const_ref, w_ref = enc.apply(v, x, rngs={"noise": jax.random.PRNGKey(33)})
    monkeypatch.setenv("TPUGAN_S2D", "1")
    monkeypatch.setenv("TPUGAN_S2D_MIN_H", "8")
    const_got, w_got = enc.apply(v, x, rngs={"noise": jax.random.PRNGKey(33)})
    np.testing.assert_allclose(
        np.asarray(w_got), np.asarray(w_ref), atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(const_got), np.asarray(const_ref), atol=1e-4, rtol=1e-4
    )


def test_encoder_block_s2d_gradients_close(monkeypatch):
    # the S2D-domain block is in the training gradient path: check grads
    from tpugan.models.encoders import Encoder

    enc = Encoder(
        startf=8, maxf=32, layer_count=3, latent_size=32, use_blur=True,
        use_noise=False,
    )
    x = jax.random.normal(jax.random.PRNGKey(34), (2, 16, 16, 3))
    v = enc.init({"params": jax.random.PRNGKey(35)}, x)

    def loss(params):
        const, w = enc.apply({**v, "params": params}, x)
        return jnp.sum(const**2) + jnp.sum(w**2)

    g_ref = jax.grad(loss)(v["params"])
    monkeypatch.setenv("TPUGAN_S2D", "1")
    monkeypatch.setenv("TPUGAN_S2D_MIN_H", "8")
    g_got = jax.grad(loss)(v["params"])
    for a, b in zip(jax.tree.leaves(g_got), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4
        )


def test_s2d_off_by_default():
    from tpugan.ops.s2d import use_s2d

    assert use_s2d(1024, 1024, 16) is False  # env flag absent in tests


def test_expand_kernel_zeros_structure():
    # the expanded 3x3 kernel has exactly 9 live taps per (c, k) pair
    # spread over 3x3 x (2x2 out-phase) x (2x2 in-phase) slots
    c = k = 2
    wt = jnp.ones((3, 3, c, k))
    w_s2d, (plo, phi) = expand_kernel_s2d(wt)
    assert w_s2d.shape == (3, 3, 4 * c, 4 * k)
    assert (plo, phi) == (1, 1)
    # each OUTPUT phase receives exactly the 9 original taps (one live
    # slot per (ky, kx)), spread across (di, dj, in-phase)
    live = np.asarray(w_s2d).reshape(3, 3, 4, c, 4, k).sum(axis=(0, 1, 2))
    np.testing.assert_array_equal(live, 9 * np.ones((c, 4, k)))
