"""Benchmark harness: flagship encoder-training throughput.

Measures the full case-1 E_align training step (StyleGANv1 Cat256 config:
--mtype 1, --start_features 64, batch 2 — BASELINE.md) on the current
accelerator and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is the per-chip speedup over the same jitted step executed on
the host CPU (measured once and cached in bench_baseline.json — the
reference repo publishes no numbers to compare against, BASELINE.md).
"""

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

from tpugan.runtime import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

BASELINE_FILE = pathlib.Path(__file__).resolve().parent / "bench_baseline.json"

LAYER_COUNT = 7  # 256x256
STARTF = 64
LATENT = 512
BATCH = 2


def build_step():
    from tpugan.models import Encoder, StyleGANv1Generator, StyleGANv1Mapping
    from tpugan.optim import lreq_adam
    from tpugan.ops.eq_lr import lreq_coef_tree
    from tpugan.train import build_stylegan1_pipeline, make_train_step
    from tpugan.train.e_align import init_train_state, make_encode_fn

    gen = StyleGANv1Generator(startf=STARTF, maxf=512, layer_count=LAYER_COUNT, latent_size=LATENT)
    gm = StyleGANv1Mapping(num_layers=2 * LAYER_COUNT, mapping_layers=8)
    enc = Encoder(startf=STARTF, maxf=512, layer_count=LAYER_COUNT, latent_size=LATENT)

    key = jax.random.PRNGKey(0)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        gm_vars = jax.jit(gm.init)(key, jnp.zeros((BATCH, LATENT)))
        gen_vars = jax.jit(gen.init)(
            {"params": key, "noise": key}, jnp.zeros((BATCH, 2 * LAYER_COUNT, LATENT))
        )
        enc_vars = jax.jit(enc.init)(
            {"params": key, "noise": key}, jnp.zeros((BATCH, 256, 256, 3))
        )

    coefs_tree = lreq_coef_tree(enc_vars["params"], enc_vars["lreq"])
    opt = lreq_adam(0.0015, coefs=coefs_tree)
    synth, resynth, frozen = build_stylegan1_pipeline(gen, gm, gen_vars, gm_vars, lod=LAYER_COUNT - 1)
    step = make_train_step(
        encode=make_encode_fn(enc, {k: v for k, v in enc_vars.items() if k != "params"}),
        synth=synth,
        resynth=resynth,
        optimizer=opt,
        z_dim=LATENT,
        batch_size=BATCH,
        case=1,
    )
    state = init_train_state(enc_vars["params"], opt)
    return step, state, frozen


def time_step(step, state, frozen, iters, device=None):
    ctx = jax.default_device(device) if device is not None else _nullcontext()
    with ctx:
        jitted = jax.jit(step)
        # pin state+weights to the target device EXPLICITLY: CPU-committed
        # arrays silently drag the whole jit onto the CPU
        target = device or jax.devices()[0]
        state = jax.device_put(state, target)
        frozen = jax.device_put(frozen, target)
        state, info = jitted(state, jnp.int32(0), frozen)  # compile + warm
        jax.block_until_ready(state)
        t0 = time.perf_counter()
        for i in range(iters):
            state, info = jitted(state, jnp.int32(i), frozen)
        jax.block_until_ready(state)
        dt = (time.perf_counter() - t0) / iters
    return dt


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


def main():
    step, state, frozen = build_step()

    dt = time_step(step, state, frozen, iters=30)
    steps_per_sec = 1.0 / dt
    images_per_sec = BATCH * steps_per_sec

    if BASELINE_FILE.exists():
        cpu_images_per_sec = json.loads(BASELINE_FILE.read_text())["cpu_images_per_sec"]
    else:
        cpu_dt = time_step(step, state, frozen, iters=2, device=jax.local_devices(backend="cpu")[0])
        cpu_images_per_sec = BATCH / cpu_dt
        BASELINE_FILE.write_text(
            json.dumps(
                {
                    "config": "stylegan1-cat256 e_align case1 train step, batch 2, fp32",
                    "cpu_images_per_sec": cpu_images_per_sec,
                    "note": "host-CPU throughput of the identical jitted step; "
                    "reference repo publishes no numbers (BASELINE.md)",
                }
            )
        )

    print(
        json.dumps(
            {
                "metric": "e_align_train_images_per_sec_256",
                "value": round(images_per_sec, 3),
                "unit": "images/sec/chip",
                "vs_baseline": round(images_per_sec / cpu_images_per_sec, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
