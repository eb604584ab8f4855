"""Adversarial (ALAE-style) GAN training tests."""

import pytest

pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpugan.models.stylegan1 import (
    StyleGANv1Discriminator,
    StyleGANv1Generator,
    StyleGANv1Mapping,
)
from tpugan.train.gan import (
    GANTrainState,
    LODSchedule,
    discriminator_logistic_simple_gp,
    ema_params,
    generator_logistic_non_saturating,
    make_gan_steps,
)


@pytest.mark.heavy
def test_adversarial_steps_update_both_networks(rng):
    layer_count, latent = 3, 32
    gen = StyleGANv1Generator(startf=8, maxf=32, layer_count=layer_count, latent_size=latent)
    gm = StyleGANv1Mapping(
        num_layers=2 * layer_count, mapping_layers=2, latent_size=latent,
        dlatent_size=latent, mapping_fmaps=latent,
    )
    disc = StyleGANv1Discriminator(startf=8, maxf=32, layer_count=layer_count)
    key = jax.random.PRNGKey(0)
    g_params = {
        "gen": gen.init({"params": key, "noise": key}, jnp.zeros((1, 6, latent))),
        "gm": gm.init(key, jnp.zeros((1, latent))),
    }
    d_params = disc.init(key, jnp.zeros((1, 16, 16, 3)))

    g_opt = optax.adam(1e-3)
    d_opt = optax.adam(1e-3)
    state = GANTrainState(
        g_params=g_params, d_params=d_params,
        dlatent_avg=jnp.zeros((2 * layer_count, latent)),
        g_opt=g_opt.init(g_params), d_opt=d_opt.init(d_params),
        step=jnp.zeros([], jnp.int32),
    )
    d_step, g_step = make_gan_steps(
        gen, gm, disc, g_opt, d_opt, lod=layer_count - 1, latent_size=latent
    )
    reals = jnp.asarray(rng.randn(4, 16, 16, 3).astype(np.float32))

    d_step_j = jax.jit(d_step)
    state2, d_loss = d_step_j(state, reals, jax.random.PRNGKey(1))
    assert np.isfinite(float(d_loss))
    delta_d = sum(
        float(jnp.abs(a - b).sum())
        for a, b in zip(jax.tree.leaves(state.d_params), jax.tree.leaves(state2.d_params))
    )
    assert delta_d > 0

    g_step_j = jax.jit(g_step, static_argnums=1)
    state3, g_loss = g_step_j(state2, 4, jax.random.PRNGKey(2))
    assert np.isfinite(float(g_loss))
    delta_g = sum(
        float(jnp.abs(a - b).sum())
        for a, b in zip(jax.tree.leaves(state2.g_params), jax.tree.leaves(state3.g_params))
    )
    assert delta_g > 0
    # dlatent average EMA moved off zero
    assert float(jnp.abs(state3.dlatent_avg).sum()) > 0


def test_losses_shapes():
    fake = jnp.asarray([-1.0, 2.0])
    real = jnp.asarray([1.0, 0.5])
    g = generator_logistic_non_saturating(fake)
    d = discriminator_logistic_simple_gp(fake, real, r1_grads=jnp.ones((2, 4, 4, 3)))
    assert np.isfinite(float(g)) and np.isfinite(float(d))
    # R1 increases the loss
    d0 = discriminator_logistic_simple_gp(fake, real)
    assert float(d) > float(d0)


def test_ema_and_schedule():
    slow = {"w": jnp.zeros(3)}
    fast = {"w": jnp.ones(3)}
    out = ema_params(slow, fast, beta=0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.1, rtol=1e-5)

    sched = LODSchedule(epochs_per_lod=4, dataset_size=100, max_lod=3)
    assert sched.lod(0) == 0 and sched.lod(5) == 1 and sched.lod(100) == 3
    assert sched.batch_size(0) == 128
    assert sched.blend(0, 50) == 1.0  # lod 0 never blends
    b = sched.blend(4, 50)  # first transition epoch of lod 1
    assert 0.0 <= b <= 1.0
