"""Supplementary bench: StyleGAN2-1024 case-2 E_Blur training step.

The BASELINE.md flagship config (--mtype 2, --start_features 16, 1024^2,
image gradients through the full pixel pipeline). Prints one JSON line.
Usage: python scripts/bench_sg2_1024.py [--batch N] [--res 1024] [--remat]
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from tpugan.runtime import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--remat_policy", default=None, choices=("conv_outs",))
    ap.add_argument("--no_lpips", action="store_true",
                    help="drop the LPIPS term (NOT the reference workload)")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 generator + encoder compute with bf16 LPIPS "
                         "heads (the bench.py bf16 configuration)")
    args = ap.parse_args()

    from tpugan.models import Encoder, StyleGAN2Generator
    from tpugan.optim import lreq_adam
    from tpugan.ops.eq_lr import lreq_coef_tree
    from tpugan.train import make_encode_fn, make_train_step
    from tpugan.train.e_align import SynthBatch, init_train_state

    res = args.res
    startf = {128: 128, 256: 64, 512: 32, 1024: 16}[res]
    layer_count = {128: 6, 256: 7, 512: 8, 1024: 9}[res]
    batch = args.batch

    gen = StyleGAN2Generator(resolution=res)
    enc = Encoder(startf=startf, maxf=512, layer_count=layer_count, latent_size=512, use_blur=True)
    key = jax.random.PRNGKey(0)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        gvars = jax.jit(gen.init)({"params": key}, jnp.zeros((1, 512)))
        evars = jax.jit(enc.init)({"params": key, "noise": key}, jnp.zeros((1, res, res, 3)))
    print("init done", flush=True)

    coefs = lreq_coef_tree(evars["params"], evars["lreq"])
    opt = lreq_adam(0.0015, coefs=coefs)

    def synth(frozen, k, z):
        out = gen.apply(frozen, z, trunc_psi=0.7, trunc_layers=8)
        const1 = jnp.repeat(frozen["params"]["synthesis"]["const"], z.shape[0], axis=0)
        return SynthBatch(w1=out["wp"], imgs1=out["image"], const1=const1)

    def resynth(frozen, w, b, k):
        return gen.apply(frozen, w, method=gen.synthesize)["image"]

    encode = make_encode_fn(enc, {k_: v for k_, v in evars.items() if k_ != "params"})
    if args.bf16:
        from tpugan.precision import bf16_encode, bf16_frozen, bf16_pipeline

        synth, resynth = bf16_pipeline(synth, resynth)
        encode = bf16_encode(encode)
        gvars = bf16_frozen(gvars)
    from tpugan.losses.lpips import random_lpips_fn

    step = make_train_step(
        encode=encode,
        synth=synth,
        resynth=resynth,
        optimizer=opt,
        z_dim=512,
        batch_size=batch,
        case=2,
        remat=args.remat,
        remat_policy=args.remat_policy,
        lpips_fn=None if args.no_lpips else random_lpips_fn(
            dtype=jnp.bfloat16 if args.bf16 else None
        ),
    )
    from tpugan.runtime import to_accelerator

    state = to_accelerator(init_train_state(evars["params"], opt))
    frozen = to_accelerator(gvars)
    jitted = jax.jit(step)

    t0 = time.time()
    state, info = jitted(state, jnp.int32(0), frozen)
    jax.block_until_ready(state)
    print(f"compile+first step: {time.time()-t0:.0f}s", flush=True)

    t0 = time.perf_counter()
    for i in range(args.iters):
        state, info = jitted(state, jnp.int32(i), frozen)
    jax.block_until_ready(state)
    dt = (time.perf_counter() - t0) / args.iters
    print(
        json.dumps(
            {
                "metric": f"e_blur_case2_train_images_per_sec_{res}",
                "value": round(batch / dt, 3),
                "unit": "images/sec/chip",
                "ms_per_step": round(dt * 1e3, 1),
                "bf16": args.bf16,
                "loss_tsa": float(info.loss_tsa),
            }
        )
    )


if __name__ == "__main__":
    main()
