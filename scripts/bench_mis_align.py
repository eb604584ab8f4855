"""Mis-aligned (Grad-CAM) encoder training throughput — SGv1 Cat256.

The reference's E_mis_align_cropping_s1.py is its worst host/device-churn
loop: per iteration it runs Grad-CAM++ on both images (a VGG16
forward+backward each), guided backprop on both (another VGG16
forward+backward each), hops the masks through numpy/cv2 for the JET
colormap, and then feeds imgs/mask/CAM through space_loss (with LPIPS —
six more VGG16 passes) before the latent step (:139-201). Here the whole
iteration — synthesis, encoding, CAM++, guided backprop, colormap, all
four space_loss groups, LREQAdam — is ONE jitted XLA program
(train/e_mis_align.py), so this benchmark measures the reference's full
per-iteration workload with zero host round-trips.

Config mirrors the reference defaults: mtype 1 (StyleGANv1 256,
start_features 64), batch 5, lr 0.0015 (E_mis_align_cropping_s1.py:307-310).
Prints one JSON line.

Usage: python scripts/bench_mis_align.py [--batch 5] [--bf16] [--no_gbp]
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
    ap.add_argument("--batch", type=int, default=5)  # reference default
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--no_lpips", action="store_true")
    ap.add_argument("--no_gbp", action="store_true",
                    help="drop the guided-backprop loss_grad group (the "
                         "reference always computes it)")
    ap.add_argument("--bf16_cam", action="store_true",
                    help="run the CAM++/GBP VGG16 stack in bf16 too "
                         "(attention losses are log-only)")
    ap.add_argument("--lean", action="store_true",
                    help="the CLI's off-tick lean step: skip the log-only "
                         "CAM/GBP/image stack entirely (update bitwise "
                         "identical; sustained = 99/100 lean + 1/100 full "
                         "at log_every=100)")
    args = ap.parse_args()

    import bench
    from tpugan.losses.vgg import VGG16
    from tpugan.models import Encoder, StyleGANv1Generator, StyleGANv1Mapping
    from tpugan.optim import lreq_adam
    from tpugan.ops.eq_lr import lreq_coef_tree
    from tpugan.train import make_encode_fn
    from tpugan.train.e_align import build_stylegan1_pipeline, init_train_state
    from tpugan.train.e_mis_align import make_mis_align_step

    STARTF, LAYER_COUNT, LATENT = bench.STARTF, bench.LAYER_COUNT, bench.LATENT
    gen = StyleGANv1Generator(startf=STARTF, maxf=512, layer_count=LAYER_COUNT,
                              latent_size=LATENT)
    gm = StyleGANv1Mapping(num_layers=2 * LAYER_COUNT, mapping_layers=8)
    enc = Encoder(startf=STARTF, maxf=512, layer_count=LAYER_COUNT,
                  latent_size=LATENT)
    vgg = VGG16()
    key = jax.random.PRNGKey(0)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        gm_vars = jax.jit(gm.init)(key, jnp.zeros((args.batch, LATENT)))
        gen_vars = jax.jit(gen.init)(
            {"params": key, "noise": key},
            jnp.zeros((args.batch, 2 * LAYER_COUNT, LATENT)),
        )
        enc_vars = jax.jit(enc.init)(
            {"params": key, "noise": key}, jnp.zeros((args.batch, 256, 256, 3))
        )
        # random VGG weights cost exactly what trained ones cost (and the
        # CAM/GBP/LPIPS structure is identical) — fine for throughput
        vgg_vars = jax.jit(vgg.init)(
            jax.random.PRNGKey(7), jnp.zeros((1, 256, 256, 3))
        )

    synth, resynth, frozen = build_stylegan1_pipeline(
        gen, gm, gen_vars, gm_vars, lod=LAYER_COUNT - 1
    )
    encode = make_encode_fn(enc, {k: v for k, v in enc_vars.items() if k != "params"})
    if args.bf16:
        from tpugan.precision import bf16_encode, bf16_frozen, bf16_pipeline

        synth, resynth = bf16_pipeline(synth, resynth)
        encode = bf16_encode(encode)
        frozen = bf16_frozen(frozen)
        # the VGG16 CAM/GBP stack stays fp32 unless --bf16_cam (its
        # backward IS the attention signal; bf16_lpips covers the heads)
    if args.bf16_cam:
        from tpugan.precision import cast_floating

        vgg_vars = cast_floating(vgg_vars, jnp.bfloat16)

    coefs = lreq_coef_tree(enc_vars["params"], enc_vars["lreq"])
    opt = lreq_adam(0.0015, coefs=coefs)

    step = make_mis_align_step(
        encode=encode, synth=synth, resynth=resynth, optimizer=opt,
        vgg=vgg, z_dim=LATENT, batch_size=args.batch,
        lpips_fn=None if args.no_lpips else bench.bench_lpips_fn(bf16=args.bf16),
        vgg_guided=None if args.no_gbp else VGG16(guided=True),
        cam_bf16=args.bf16_cam,
        compute_attention_losses=not args.lean,
    )
    state = init_train_state(enc_vars["params"], opt)

    # pack (frozen, vgg_vars) so bench.time_step's 3-arg contract holds
    def step3(state, iteration, packed):
        return step(state, iteration, packed[0], packed[1])

    peak = bench.chip_peak_flops()
    bw = bench.chip_hbm_bw()
    dt, flops, nbytes = bench.time_step(
        step3, state, (frozen, vgg_vars), iters=args.iters, want_flops=True
    )
    entry = bench.metric_entry(
        "e_mis_align_train_images_per_sec_256"
        + ("_lean" if args.lean else ""),
        args.batch, dt, flops, peak, nbytes, bw,
    )
    entry["bf16"] = args.bf16
    if args.lean:
        entry["workload"] = "off-tick lean step (log-only CAM/GBP/image stack skipped)"
    else:
        entry["workload"] = (
            "in-graph CAM++ (2x VGG fwd+bwd) + guided backprop (2x VGG fwd+bwd)"
            " + LPIPS (6 VGG fwd) per iteration"
            if not args.no_gbp else "in-graph CAM++ + LPIPS, no GBP"
        )
    print(json.dumps(entry))


if __name__ == "__main__":
    main()
