"""Adversarial GAN training (ALAE-style wrapper) for StyleGANv1.

Rebuild of the reference's ALAE extras (model/stylegan1/model.py,
losses.py, lod_driver.py — kept in the repo for the baseline harnesses):
  * logistic non-saturating G loss and simple-GP D loss with R1 penalty
    (losses.py:17-37)
  * ``generate``: mapping -> dlatent-average EMA -> style mixing ->
    truncation -> synthesis (model.py:47-73), functional (the EMA buffer
    is explicit state, not a hidden module buffer)
  * alternating D/G train steps (model.py:75-92) as jitted functions
  * ``LODSchedule``: the progressive-growing lod/blend/batch schedule
    (lod_driver.py:7-88) as a pure function of the iteration counter
  * ``ema_params``: the smoothed-generator lerp (model.py:94-99)
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from tpugan.models.stylegan1 import truncation_coefs


# ---------------------------------------------------------------------------
# losses (model/stylegan1/losses.py)
# ---------------------------------------------------------------------------


def generator_logistic_non_saturating(d_result_fake):
    """softplus(-D(G(z))).mean() (losses.py:36-37)."""
    return jnp.mean(jax.nn.softplus(-d_result_fake))


def discriminator_logistic_simple_gp(d_result_fake, d_result_real, r1_grads=None, r1_gamma=10.0):
    """softplus(fake) + softplus(-real) + R1 penalty (losses.py:17-26).

    ``r1_grads``: dD/dx_real (computed by the caller so the whole loss is
    one jitted function)."""
    loss = jnp.mean(jax.nn.softplus(d_result_fake)) + jnp.mean(
        jax.nn.softplus(-d_result_real)
    )
    if r1_grads is not None and r1_gamma != 0.0:
        r1 = jnp.sum(jnp.square(r1_grads)) / d_result_real.shape[0]
        loss = loss + r1 * (r1_gamma * 0.5)
    return loss


def kl(mu, log_var):
    """losses.py:9-11."""
    return -0.5 * jnp.mean(
        jnp.mean(1 + log_var - jnp.square(mu) - jnp.exp(log_var), axis=1)
    )


def reconstruction(recon_x, x):
    """losses.py:13-15."""
    return jnp.mean(jnp.square(recon_x - x))


# ---------------------------------------------------------------------------
# ALAE-style model ops (model/stylegan1/model.py)
# ---------------------------------------------------------------------------


def generate(
    gen,
    gm,
    gen_params,
    gm_params,
    dlatent_avg,
    key,
    lod: int,
    blend: float = 1.0,
    z: Optional[jax.Array] = None,
    count: int = 32,
    latent_size: int = 512,
    dlatent_avg_beta: Optional[float] = 0.995,
    style_mixing_prob: Optional[float] = 0.9,
    truncation_psi: Optional[float] = 0.7,
    truncation_cutoff: Optional[int] = 8,
    train: bool = True,
):
    """Model.generate (model.py:47-73). Returns (images, new_dlatent_avg).

    Style mixing uses a traced bernoulli + uniform cutoff (the reference's
    python random calls become PRNG draws so the step stays jitted)."""
    kz, kmix, kcut, knoise, knoise2 = jax.random.split(key, 5)
    if z is None:
        z = jax.random.normal(kz, (count, latent_size))
    styles = gm.apply(gm_params, z)

    if train and dlatent_avg_beta is not None:
        batch_avg = jnp.mean(styles, axis=0)
        dlatent_avg = dlatent_avg + (batch_avg - dlatent_avg) * (1.0 - dlatent_avg_beta)

    if train and style_mixing_prob is not None:
        z2 = jax.random.normal(kz, z.shape)
        styles2 = gm.apply(gm_params, z2)
        num_layers = styles.shape[1]
        cur_layers = (lod + 1) * 2
        mixing_cutoff = jax.random.randint(kcut, (), 1, cur_layers + 1)
        layer_idx = jnp.arange(num_layers)[None, :, None]
        mixed = jnp.where(layer_idx < mixing_cutoff, styles, styles2)
        do_mix = jax.random.uniform(kmix) < style_mixing_prob
        styles = jnp.where(do_mix, mixed, styles)

    if truncation_psi is not None:
        coefs = truncation_coefs(styles.shape[1], truncation_psi, truncation_cutoff)
        styles = dlatent_avg[None] + (styles - dlatent_avg[None]) * coefs

    images = gen.apply(gen_params, styles, lod, blend, rngs={"noise": knoise})
    return images, dlatent_avg


class GANTrainState(NamedTuple):
    g_params: Any  # {'gen': ..., 'gm': ...}
    d_params: Any
    dlatent_avg: jax.Array
    g_opt: Any
    d_opt: Any
    step: jax.Array


def make_gan_steps(
    gen, gm, disc, g_optimizer, d_optimizer,
    lod: int, blend: float = 1.0, latent_size: int = 512, r1_gamma: float = 10.0,
):
    """Alternating D/G steps (Model.forward d_train branches, model.py:75-92)."""

    def d_step(state: GANTrainState, reals, key):
        kgen, kd = jax.random.split(key)
        fakes, dlatent_avg = generate(
            gen, gm, state.g_params["gen"], state.g_params["gm"], state.dlatent_avg,
            kgen, lod, blend, count=reals.shape[0], latent_size=latent_size,
        )
        fakes = jax.lax.stop_gradient(fakes)

        def loss_fn(d_params):
            d_real_fn = lambda x: disc.apply(d_params, x, lod).squeeze(-1)
            d_real, r1_vjp = jax.vjp(d_real_fn, reals)
            (r1_grads,) = r1_vjp(jnp.ones_like(d_real))
            d_fake = d_real_fn(fakes)
            return discriminator_logistic_simple_gp(d_fake, d_real, r1_grads, r1_gamma)

        loss, grads = jax.value_and_grad(loss_fn)(state.d_params)
        updates, d_opt = d_optimizer.update(grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, updates)
        return (
            state._replace(d_params=d_params, d_opt=d_opt, dlatent_avg=dlatent_avg,
                           step=state.step + 1),
            loss,
        )

    def g_step(state: GANTrainState, batch_size, key):
        def loss_fn(g_params):
            fakes, dlatent_avg = generate(
                gen, gm, g_params["gen"], g_params["gm"], state.dlatent_avg,
                key, lod, blend, count=batch_size, latent_size=latent_size,
            )
            d_fake = disc.apply(state.d_params, fakes, lod).squeeze(-1)
            return generator_logistic_non_saturating(d_fake), dlatent_avg

        (loss, dlatent_avg), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.g_params)
        updates, g_opt = g_optimizer.update(grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, updates)
        return (
            state._replace(g_params=g_params, g_opt=g_opt, dlatent_avg=dlatent_avg),
            loss,
        )

    return d_step, g_step


def ema_params(slow, fast, beta: float = 0.999):
    """Smoothed-generator lerp (Model.lerp, model.py:94-99)."""
    return jax.tree.map(lambda s, f: s + (f - s) * (1.0 - beta), slow, fast)


# ---------------------------------------------------------------------------
# progressive schedule (model/stylegan1/lod_driver.py)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class LODSchedule:
    """Progressive-growing schedule as a pure function of epoch/iteration
    (LODDriver, lod_driver.py:7-88)."""

    lod_2_batch: tuple = (128, 128, 128, 64, 32, 16)
    epochs_per_lod: int = 15
    dataset_size: int = 60000
    max_lod: int = 5

    def lod(self, epoch: int) -> int:
        return min(epoch // self.epochs_per_lod, self.max_lod)

    def batch_size(self, epoch: int) -> int:
        return self.lod_2_batch[min(self.lod(epoch), len(self.lod_2_batch) - 1)]

    def in_transition(self, epoch: int) -> bool:
        return (epoch % self.epochs_per_lod) < (self.epochs_per_lod // 2) and self.lod(epoch) > 0

    def blend(self, epoch: int, iteration: int) -> float:
        """Sinusoidal fade-in (lod_driver.py:42-49)."""
        if not self.in_transition(epoch):
            return 1.0
        b = float((epoch % self.epochs_per_lod) * self.dataset_size + iteration)
        b /= float(max(1, self.epochs_per_lod // 2) * self.dataset_size)
        return math.sin(b * math.pi - 0.5 * math.pi) * 0.5 + 0.5
