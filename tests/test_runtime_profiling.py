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


def test_compilation_cache_scoped_per_host():
    """The cache dir is suffixed with the host fingerprint so AOT entries
    from a different machine can never be loaded (round-3 artifacts were
    full of cpu_aot_loader machine-feature errors from a shared dir)."""
    import jax

    from tpugan.runtime import host_fingerprint

    fp = host_fingerprint()
    assert len(fp) == 12 and all(c in "0123456789abcdef" for c in fp)
    assert host_fingerprint() == fp  # stable within a host
    enable_compilation_cache("/tmp/jax_cache_test2")
    assert jax.config.jax_compilation_cache_dir == f"/tmp/jax_cache_test2/{fp}"


def test_init_distributed_single_host_noop():
    """--multihost on one host: returns False and leaves the session
    usable (no raise, devices still visible)."""
    import jax

    from tpugan.runtime import init_distributed

    assert init_distributed() is False
    assert len(jax.devices()) >= 1


def _failing_initialize(monkeypatch):
    import jax

    def boom(**kw):
        raise RuntimeError("coordinator unreachable (simulated)")

    monkeypatch.setattr(jax.distributed, "initialize", boom)


def test_init_distributed_raises_on_explicit_group(monkeypatch):
    """An explicitly-described process group must FAIL FAST when the
    coordinator cannot come up (ADVICE r4): a silent single-host fallback
    on a real pod leaves N independent jobs running."""
    import pytest

    from tpugan.runtime import init_distributed

    _failing_initialize(monkeypatch)
    with pytest.raises(RuntimeError, match="refusing to fall back"):
        init_distributed(
            coordinator_address="coord:1234", num_processes=2, process_id=0
        )


def test_init_distributed_raises_under_pod_markers(monkeypatch):
    import pytest

    from tpugan.runtime import init_distributed

    _failing_initialize(monkeypatch)
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host0,host1")
    with pytest.raises(RuntimeError, match="refusing to fall back"):
        init_distributed()


def test_is_primary_host_single_process():
    from tpugan.runtime import is_primary_host

    assert is_primary_host() is True


def test_multihost_flag_parses():
    import argparse

    from tpugan.cli.common import add_common_args

    p = add_common_args(argparse.ArgumentParser(), training=True)
    args = p.parse_args(["--multihost"])
    assert args.multihost is True
    assert p.parse_args([]).multihost is False


def test_cpu_executables_excluded_from_persistent_cache():
    """XLA:CPU AOT reload is broken in this build (pseudo machine features
    never match host detection -> error spam + SIGILL risk), so
    enable_compilation_cache must gate the cache off for cpu-platform
    backends while leaving others cacheable."""
    from jax._src import compilation_cache as cc

    enable_compilation_cache("/tmp/jax_cache_test3")
    assert getattr(cc.is_cache_used, "_tpugan_cpu_filter", False)

    class FakeCpu:
        platform = "cpu"

    assert cc.is_cache_used(FakeCpu()) is False
