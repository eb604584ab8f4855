"""Pro-GAN alternative stack tests (shapes, fade-in blending)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from tpugan.models.pggan_alt import (
    ProGANDiscriminator,
    ProGANEncoder,
    ProGANGenerator,
    SmallEncoder,
)


@pytest.mark.slow
def test_progan_generator_depths(rng):
    gen = ProGANGenerator(depth=5, latent_size=64)
    z = jnp.asarray(rng.randn(2, 64).astype(np.float32))
    variables = gen.init(jax.random.PRNGKey(0), z)
    # full depth: 4 * 2^4 = 64
    assert gen.apply(variables, z).shape == (2, 64, 64, 3)
    assert gen.apply(variables, z, depth=0).shape == (2, 4, 4, 3)
    # fade-in: alpha blends straight and upsampled-residual RGB
    a0 = gen.apply(variables, z, depth=2, alpha=0.0)
    a1 = gen.apply(variables, z, depth=2, alpha=1.0)
    ah = gen.apply(variables, z, depth=2, alpha=0.5)
    np.testing.assert_allclose(
        np.asarray(ah), 0.5 * np.asarray(a0) + 0.5 * np.asarray(a1), rtol=1e-4, atol=1e-5
    )


@pytest.mark.slow
def test_progan_discriminator_and_conditional(rng):
    d = ProGANDiscriminator(height=5, feature_size=64)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    variables = d.init(jax.random.PRNGKey(0), x)
    assert d.apply(variables, x).shape == (2,)

    dc = ProGANDiscriminator(height=4, feature_size=64, conditional=True, num_classes=10)
    x = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    labels = jnp.asarray([1, 7])
    variables = dc.init(jax.random.PRNGKey(0), x, labels=labels)
    assert dc.apply(variables, x, labels=labels).shape == (2,)


@pytest.mark.slow
def test_progan_encoder_and_small(rng):
    enc = ProGANEncoder(height=5, feature_size=64)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    variables = enc.init(jax.random.PRNGKey(0), x)
    assert enc.apply(variables, x).shape == (2, 64)

    small = SmallEncoder()
    x = jnp.asarray(rng.randn(1, 1024, 1024, 3).astype(np.float32))
    variables = small.init(jax.random.PRNGKey(0), x)
    assert small.apply(variables, x).shape == (1, 512)
