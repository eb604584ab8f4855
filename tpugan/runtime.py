"""Runtime environment helpers (compilation cache, backend quirks).

The axon TPU plugin ignores JAX_PLATFORMS and this jax build ignores the
JAX_COMPILATION_CACHE_DIR env var, so the persistent compilation cache must
be enabled through jax.config (see .claude/skills/verify/SKILL.md for the
full list of environment gotchas)."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    """Enable the persistent compilation cache (idempotent).

    Call before the first jit; makes TPU reruns start in seconds instead
    of minutes over the tunnel."""
    import jax

    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these knobs


def to_accelerator(tree, device=None):
    """device_put a pytree onto the accelerator, explicitly.

    Arrays initialised under ``jax.default_device(cpu)`` come out
    CPU-committed; passing them to jit drags the whole computation onto the
    CPU silently. ``jax.device_put(x)`` without a device does NOT move
    committed arrays — the device must be explicit."""
    import jax

    device = device or jax.devices()[0]
    return jax.device_put(tree, device)
