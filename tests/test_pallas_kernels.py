"""Pallas kernels vs jnp/XLA references (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpugan.ops.upfirdn import _upfirdn2d_xla, setup_fir_kernel
from tpugan.ops.pallas.upfirdn2d import upfirdn2d_pallas


@pytest.mark.parametrize(
    "up,down,taps,pad,shape",
    [
        (1, 1, (1, 2, 1), (1, 1), (2, 8, 8, 4)),       # blur3x3, same size
        (1, 1, (1, 2, 1), (1, 1), (1, 16, 12, 8)),     # non-square
        (2, 1, (1, 3, 3, 1), (3, 1), (2, 8, 8, 4)),    # SG2 upsample x2
        (1, 2, (1, 3, 3, 1), (1, 1), (2, 16, 16, 4)),  # SG2 downsample x2
        (1, 1, (1, 3, 3, 1), (2, 1), (1, 8, 8, 4)),    # plain FIR, asym pad
        (2, 1, (1, 2, 1), (2, 0), (1, 6, 6, 2)),       # odd kernel upsample
    ],
)
def test_upfirdn2d_pallas_matches_xla(rng, up, down, taps, pad, shape):
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    k = setup_fir_kernel(taps)
    ref = _upfirdn2d_xla(x, k, up, down, pad, 1.0)
    got = upfirdn2d_pallas(x, k, up=up, down=down, pad=pad, interpret=True)
    assert got.shape == ref.shape, (got.shape, ref.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_upfirdn2d_pallas_tiled(rng):
    """Force multiple row tiles (small VMEM budget path) via a tall image."""
    from tpugan.ops.pallas import upfirdn2d as mod

    orig = mod._pick_tile_h
    mod._pick_tile_h = lambda *a, **kw: 4
    try:
        x = jnp.asarray(rng.randn(1, 32, 8, 4).astype(np.float32))
        k = setup_fir_kernel((1, 3, 3, 1))
        ref = _upfirdn2d_xla(x, k, 2, 1, (3, 1), 1.0)
        got = upfirdn2d_pallas(x, k, up=2, down=1, pad=(3, 1), interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)
    finally:
        mod._pick_tile_h = orig


@pytest.mark.parametrize(
    "taps,pad,shape",
    [
        ((1, 2, 1), (1, 1), (2, 16, 16, 16)),
        ((1, 3, 3, 1), (2, 1), (1, 32, 24, 8)),
        ((1, 2, 1), (1, 1), (2, 9, 11, 4)),
    ],
)
def test_upfirdn2d_small_c_matches_xla(rng, taps, pad, shape):
    """Flat-lane small-channel path (same-size FIR)."""
    from tpugan.ops.pallas.upfirdn2d import upfirdn2d_pallas_small_c

    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    k = setup_fir_kernel(taps)
    ref = _upfirdn2d_xla(x, k, 1, 1, pad, 1.0)
    got = upfirdn2d_pallas_small_c(x, k, pad=pad, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)
