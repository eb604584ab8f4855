"""Real-image inversion throughput (BASELINE.md config 5).

Times the jitted 100-iteration chunk of invert/embedding on the
StyleGANv1-1024 E_Blur pipeline (embedding_img.py defaults: batch 1,
lr 0.01, 1500 iterations per image) in either mode: optimize-w (default)
or --optimizeE fine-tune-E, the reference's primary mode (LREQAdam over
all E params, embedding_img.py:66-83). Prints one JSON line with
iterations/sec — the reference runs the same loop eagerly in torch with
per-step host logging.

Usage: python scripts/bench_inversion.py [--img_size 1024] [--bf16] [--optimizeE]
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
    ap.add_argument("--img_size", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=1,
                    help="images inverted simultaneously (the reference "
                         "inverts per-image; the scan chunk is batch-"
                         "polymorphic, so a folder can be inverted in one "
                         "batched trajectory — see BASELINE.md r4 scaling)")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--chunks", type=int, default=3)
    ap.add_argument("--no_lpips", action="store_true")
    ap.add_argument("--fp32_lpips", action="store_true",
                    help="keep the LPIPS heads fp32 under --bf16 (A/B knob: "
                         "LPIPS sits in the gradient path here, unlike the "
                         "detached case-1 branches)")
    ap.add_argument("--optimizeE", action="store_true",
                    help="fine-tune-E mode (the reference's primary mode, "
                         "embedding_img.py:66-83): LREQAdam over all E "
                         "params instead of the w vector")
    args = ap.parse_args()

    import math

    from tpugan.invert import EmbeddingConfig, make_embedder
    from tpugan.models import Encoder, StyleGANv1Generator
    from tpugan.ops.eq_lr import lreq_coef_tree
    from tpugan.runtime import to_accelerator

    layer_count = int(math.log2(args.img_size)) - 1
    startf = {128: 128, 256: 64, 512: 32, 1024: 16}[args.img_size]
    gen = StyleGANv1Generator(startf=startf, maxf=512, layer_count=layer_count, latent_size=512)
    enc = Encoder(startf=startf, maxf=512, layer_count=layer_count,
                  latent_size=512, use_blur=True)
    key = jax.random.PRNGKey(0)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        gvars = jax.jit(gen.init)(
            {"params": key, "noise": key}, jnp.zeros((1, 2 * layer_count, 512))
        )
        evars = jax.jit(enc.init)(
            {"params": key, "noise": key}, jnp.zeros((1, args.img_size, args.img_size, 3))
        )

    def encode(params, imgs):
        return enc.apply(
            {**{k: v for k, v in evars.items() if k != "params"}, "params": params},
            imgs, rngs={"noise": jax.random.PRNGKey(0)},
        )

    def resynth(frozen, w):
        return gen.apply(frozen, w, layer_count - 1, rngs={"noise": jax.random.PRNGKey(0)})

    frozen = gvars
    if args.bf16:
        from tpugan.precision import bf16_frozen

        base_resynth = resynth

        def resynth(frozen, w):
            return base_resynth(frozen, w.astype(jnp.bfloat16)).astype(jnp.float32)

        frozen = bf16_frozen(frozen)

    if args.bf16 and args.optimizeE:
        from tpugan.precision import bf16_encode_images

        encode = bf16_encode_images(encode)

    coefs = lreq_coef_tree(evars["params"], evars["lreq"])
    cfg = EmbeddingConfig(
        iterations=100 * args.chunks, lr=0.01, optimize_e=args.optimizeE, chunk=100
    )
    from tpugan.losses.lpips import random_lpips_fn

    invert = make_embedder(
        encode, resynth, evars["params"], coefs, cfg, frozen=frozen,
        lpips_fn=None if args.no_lpips else random_lpips_fn(
            dtype=jnp.bfloat16 if (args.bf16 and not args.fp32_lpips) else None
        ),
    )

    imgs = to_accelerator(
        jax.random.normal(key, (args.batch, args.img_size, args.img_size, 3))
    )
    # warm (compile)
    result = invert(imgs)
    jax.block_until_ready(result.w)
    # best-of-3 windows like bench.py: the shared axon link has
    # multi-minute degraded windows with >20% swings on identical
    # executables; the fastest window reflects the hardware
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        result = invert(imgs)
        jax.block_until_ready(result.w)
        dt = min(dt, time.perf_counter() - t0)
    iters = cfg.iterations
    mode = "finetune_e" if args.optimizeE else "optimize_w"
    print(json.dumps({
        "metric": f"inversion_{mode}_iters_per_sec_{args.img_size}",
        "value": round(iters / dt, 2),
        "unit": f"iterations/sec/chip (batch {args.batch})",
        "ms_per_iteration": round(dt / iters * 1e3, 2),
        "image_iters_per_sec": round(args.batch * iters / dt, 2),
        "bf16": args.bf16,
    }))


if __name__ == "__main__":
    main()
