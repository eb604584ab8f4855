"""Runtime environment helpers (compilation cache, backend quirks).

The axon TPU plugin ignores JAX_PLATFORMS and this jax build ignores the
JAX_COMPILATION_CACHE_DIR env var, so the persistent compilation cache must
be enabled through jax.config (see .claude/skills/verify/SKILL.md for the
full list of environment gotchas)."""

from __future__ import annotations

import os


def host_fingerprint() -> str:
    """12-hex digest of the host CPU feature set + jax version.

    XLA:CPU persists AOT executables keyed by the program alone; loading
    an entry compiled on a host with different machine features makes
    ``cpu_aot_loader.cc`` spam errors on every run and can SIGILL
    outright. The cache directory is therefore scoped per host
    fingerprint: a host change starts a fresh cache instead of feeding
    foreign binaries to the loader."""
    import hashlib
    import platform

    parts = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                # x86 "flags", arm "Features" — the machine-feature list
                # the AOT loader validates against
                if line.startswith(("flags", "Features")):
                    parts.append(line.strip())
                    break
    except OSError:
        pass
    try:
        import jax

        parts.append(jax.__version__)
    except Exception:
        pass
    return hashlib.sha1("|".join(parts).encode()).hexdigest()[:12]


def enable_compilation_cache(path: str | None = None) -> None:
    """Enable the persistent compilation cache (idempotent).

    Call before the first jit; makes TPU reruns start in seconds instead
    of minutes over the tunnel. The directory is suffixed with
    ``host_fingerprint()`` so a stale cache from a different machine can
    never be loaded (round-3 artifacts were wall-to-wall
    ``cpu_aot_loader`` machine-feature errors from exactly that)."""
    import jax

    base = path or os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    scoped = os.path.join(base, host_fingerprint())
    try:
        jax.config.update("jax_compilation_cache_dir", scoped)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these knobs
    _exclude_cpu_executables_from_cache()


def _exclude_cpu_executables_from_cache() -> None:
    """Keep XLA:CPU executables OUT of the persistent cache.

    This build's XLA:CPU AOT deserializer stamps executables with pseudo
    machine features (``+prefer-no-gather``/``+prefer-no-scatter``) that
    host feature detection never reports, so every reload of a cached CPU
    executable — even one compiled seconds earlier ON THIS HOST — logs a
    ``cpu_aot_loader.cc`` machine-feature-mismatch error and then runs the
    mismatched binary anyway ("could lead to execution errors such as
    SIGILL"). Measured with /tmp/cache_probe-style A/B: first run clean,
    every rerun 6 errors per cached CPU executable; TPU executables
    round-trip fine. jax has no per-backend cache knob, so gate the
    documented ``is_cache_used(backend)`` check (private API — fail open:
    worst case is the old error spam, never a crash)."""
    try:
        from jax._src import compilation_cache as _cc

        if getattr(_cc.is_cache_used, "_tpugan_cpu_filter", False):
            return  # idempotent
        _orig = _cc.is_cache_used

        def _is_cache_used(backend):
            if getattr(backend, "platform", None) == "cpu":
                return False
            return _orig(backend)

        _is_cache_used._tpugan_cpu_filter = True
        _cc.is_cache_used = _is_cache_used
    except Exception as e:
        # fail open, but VISIBLY: a jax upgrade that renames the private
        # symbol silently reintroduces the cpu_aot_loader error spam /
        # SIGILL risk otherwise (ADVICE r4)
        print(
            "tpugan.runtime: could not install the CPU compilation-cache "
            f"filter ({type(e).__name__}: {e}); cached XLA:CPU executables "
            "may log cpu_aot_loader machine-feature errors on reload"
        )


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Opt-in multi-host initialisation (SURVEY §2.6's DCN story).

    On a multi-host TPU pod, ``jax.distributed.initialize`` wires the
    hosts into one job: ``jax.devices()`` becomes the GLOBAL device list,
    so the meshes built by ``parallel.make_mesh``/``auto_mesh`` span
    hosts and XLA routes the data-parallel gradient psum over ICI inside
    a pod slice and DCN across slices — no per-device code changes
    anywhere in tpugan, exactly as on one host.

    With no arguments the TPU runtime auto-detects the pod topology; the
    explicit args cover CPU/GPU-style process groups. Returns True when
    a multi-process group came up, False for a single-host no-op (so
    ``--multihost`` is safe to pass everywhere, including this
    single-chip environment where it cannot be exercised).

    Failure semantics (ADVICE r4): when the caller explicitly described a
    process group (coordinator_address / num_processes) or the
    environment is visibly a TPU pod, an initialize failure RAISES — a
    silent per-host fallback there would leave N independent single-host
    jobs running instead of one pod job. The quiet no-op is reserved for
    the genuinely-single-host case."""
    import jax

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except Exception as e:
        explicit_group = coordinator_address is not None or (num_processes or 0) > 1
        if explicit_group or _looks_like_pod():
            raise RuntimeError(
                "init_distributed: jax.distributed.initialize failed in a "
                "multi-host context — refusing to fall back to N independent "
                f"single-host jobs ({type(e).__name__}: {e})"
            ) from e
        print(f"init_distributed: single-host fallback ({type(e).__name__}: {e})")
        return False
    n = getattr(jax, "process_count", lambda: 1)()
    if n > 1:
        print(f"init_distributed: {n} processes, {len(jax.devices())} global devices")
    return n > 1


def _looks_like_pod() -> bool:
    """Environment markers the TPU runtime sets on multi-host pod slices.

    ``TPU_WORKER_HOSTNAMES`` exists on SINGLE-host machines too (this
    axon host sets it to ``localhost``), so it only counts as a pod
    marker when it names more than one worker."""
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if len([h for h in hostnames.split(",") if h.strip()]) > 1:
        return True
    return any(
        os.environ.get(m)
        for m in ("MEGASCALE_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS")
    )


def is_primary_host() -> bool:
    """True on process 0 (and on any single-process run).

    Multi-host CLIs gate host-side ARTIFACT WRITES (Loss.txt appends,
    image grids, stdout log records) on this so N pod processes don't
    race appends to the same shared-filesystem files (ADVICE r4). Note
    what is NOT gated: jitted computations (every process must launch the
    same SPMD program or the pod deadlocks) and orbax checkpoint saves
    (all processes must participate in the save barrier; the experiment
    dir must be a shared path on a real pod — see io/checkpoint.py)."""
    import jax

    try:
        return jax.process_index() == 0
    except Exception:
        return True


def to_accelerator(tree, device=None):
    """device_put a pytree onto the accelerator, explicitly.

    Arrays initialised under ``jax.default_device(cpu)`` come out
    CPU-committed; passing them to jit drags the whole computation onto the
    CPU silently. ``jax.device_put(x)`` without a device does NOT move
    committed arrays — the device must be explicit."""
    import jax

    device = device or jax.devices()[0]
    return jax.device_put(tree, device)
