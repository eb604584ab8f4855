"""runtime + profiling utility tests."""

import time

import numpy as np

from tpugan.profiling import StepTimer
from tpugan.runtime import enable_compilation_cache, to_accelerator


def test_step_timer():
    t = StepTimer(ema=0.5)
    for _ in range(3):
        with t:
            time.sleep(0.01)
    assert t.steps == 3
    assert t.avg is not None and t.avg > 0.005
    assert t.steps_per_sec > 0


def test_enable_compilation_cache_idempotent():
    enable_compilation_cache("/tmp/jax_cache_test")
    enable_compilation_cache("/tmp/jax_cache_test")  # no raise


def test_to_accelerator_places_on_first_device():
    import jax
    import jax.numpy as jnp

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        x = jnp.ones((4,)) * 2  # committed to cpu:0
    tree = to_accelerator({"x": x})
    assert list(tree["x"].devices())[0] == jax.devices()[0]
    np.testing.assert_allclose(np.asarray(tree["x"]), 2.0)
