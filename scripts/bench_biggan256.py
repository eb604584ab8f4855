"""BigGAN-deep encoder training throughput (BASELINE.md config 4).

Full-size biggan-deep-256 (or -512 with --img_size 512) architecture
(channel_width 128, 1000 classes, SelfAttn at 64x64 -> the 4096x1024
attention) with the conditional E_BIG encoder, random-init weights,
batch 2 — the reference's E_align_cropping_s1.py --mtype 4 configuration.
Encoder startf/layer_count follow the reference's start_features map
(readme.md:89: 64 -> 256^2 with 7 layers, 32 -> 512^2 with 8).
Prints one JSON line.

Usage: python scripts/bench_biggan256.py [--batch 2] [--bf16] [--img_size 512]
"""

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from tpugan.runtime import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--no_lpips", action="store_true")
    ap.add_argument("--img_size", type=int, default=256, choices=(256, 512))
    ap.add_argument("--lean", action="store_true",
                    help="the CLI's off-tick lean step: skip the detached "
                         "(log-only) image branch — resynthesis + six VGG16 "
                         "LPIPS passes (update bitwise identical)")
    args = ap.parse_args()

    import bench
    from tpugan.models import BigGAN, BigGANConfig, BigGANEncoder
    from tpugan.optim import lreq_adam
    from tpugan.ops.eq_lr import lreq_coef_tree
    from tpugan.train import make_encode_fn, make_train_step
    from tpugan.train.e_align import SynthBatch, init_train_state
    from tpugan.utils import one_hot, truncated_noise_sample

    # biggan-deep zoo layouts (biggan_generator.py:33-46)
    cfg = BigGANConfig.for_resolution(args.img_size, z_dim=128)
    model = BigGAN(cfg)
    startf, layer_count = {256: (64, 7), 512: (32, 8)}[args.img_size]
    enc = BigGANEncoder(
        startf=startf, maxf=512, layer_count=layer_count, cond_dim=256, z_dim=128
    )
    key = jax.random.PRNGKey(0)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        gvars = jax.jit(lambda z, l: model.init(key, z, l, 0.4))(
            jnp.zeros((1, 128)), jnp.zeros((1, 1000))
        )
        evars = jax.jit(
            lambda x, c: enc.init({"params": key, "noise": key}, x, c)
        )(jnp.zeros((1, args.img_size, args.img_size, 3)), jnp.zeros((1, 256)))

    truncation = 0.4

    def synth(frozen, k, z):
        kz, kl = jax.random.split(k)
        zt = truncated_noise_sample(kz, z.shape[0], cfg.z_dim, truncation)
        zt = zt.astype(z.dtype)  # carry the bf16 wrapper's compute dtype
        flag = jax.random.randint(kl, (), 0, cfg.num_classes)
        label = one_hot(jnp.full((z.shape[0],), flag), cfg.num_classes)
        imgs1, cond = model.apply(frozen, zt, label, truncation)
        return SynthBatch(w1=zt, imgs1=imgs1, const1=cond, label=label)

    def resynth(frozen, w2, batch, k):
        imgs2, _ = model.apply(frozen, w2, batch.label, truncation)
        return imgs2

    encode = make_encode_fn(enc, {k_: v for k_, v in evars.items() if k_ != "params"})
    if args.bf16:
        from tpugan.precision import bf16_encode, bf16_frozen, bf16_pipeline

        synth, resynth = bf16_pipeline(synth, resynth)
        encode = bf16_encode(encode)
        gvars = bf16_frozen(gvars)

    coefs = lreq_coef_tree(evars["params"], evars["lreq"])
    opt = lreq_adam(0.0015, coefs=coefs)
    from tpugan.losses.lpips import random_lpips_fn

    step = make_train_step(
        encode=encode, synth=synth, resynth=resynth, optimizer=opt,
        z_dim=cfg.z_dim, batch_size=args.batch, case=1,
        lpips_fn=None if args.no_lpips else random_lpips_fn(
            dtype=jnp.bfloat16 if args.bf16 else None
        ),
        compute_image_losses=not args.lean,
    )
    state = init_train_state(evars["params"], opt, sn=evars.get("sn"))
    peak = bench.chip_peak_flops()
    bw = bench.chip_hbm_bw()
    dt, flops, nbytes = bench.time_step(step, state, gvars, iters=args.iters, want_flops=True)
    entry = bench.metric_entry(
        f"e_big_align_train_images_per_sec_{args.img_size}"
        + ("_lean" if args.lean else ""),
        args.batch, dt, flops, peak, nbytes, bw,
    )
    entry["bf16"] = args.bf16
    if args.lean:
        entry["workload"] = "off-tick lean step (log-only image branch skipped)"
    print(json.dumps(entry))


if __name__ == "__main__":
    main()
