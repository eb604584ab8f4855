"""Misc utilities (seed discipline, one-hot, truncated noise).

JAX-native equivalents of training_utils.py:27-52. The reference reseeds
the global RNGs every iteration with ``set_seed(iteration % 30000)``
(training_utils.py:46-52, E_align_cropping_s1.py:103); here the same
discipline is a pure function from iteration to PRNG key, so the training
seed schedule (train seeds = iter % 30000, validation seeds > 30000) is
preserved without mutable global state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

TRAIN_SEED_PERIOD = 30000  # reference epoch size: epoch = iteration // 30000


def iteration_key(iteration, salt: int = 0) -> jax.Array:
    """PRNG key for a training iteration (seed = iteration % 30000)."""
    seed = jnp.asarray(iteration) % TRAIN_SEED_PERIOD
    key = jax.random.PRNGKey(salt)
    return jax.random.fold_in(key, seed)


def one_hot(labels: jax.Array, class_count: int = 1000) -> jax.Array:
    """Row-select from the identity matrix (training_utils.py:27-30)."""
    return jax.nn.one_hot(labels, class_count, dtype=jnp.float32)


def truncated_noise_sample(
    key: jax.Array, batch_size: int = 1, dim_z: int = 128, truncation: float = 1.0
) -> jax.Array:
    """BigGAN-style truncated N(0,1) on [-2, 2], scaled by ``truncation``
    (training_utils.py:32-44, scipy.truncnorm equivalent)."""
    values = jax.random.truncated_normal(key, -2.0, 2.0, (batch_size, dim_z), jnp.float32)
    return truncation * values


def count_parameters(params) -> int:
    return sum(x.size for x in jax.tree.leaves(params))
