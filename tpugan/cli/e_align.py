"""Aligned encoder training CLI (E_align_cropping_s1.py / E_align_s2.py).

``python -m tpugan.cli.e_align --mtype 1 --img_size 256 --start_features 64
[--case 2] ...`` — case 1 is the detached-image-loss script, case 2 the
E_Blur variant with image gradients.
"""

from __future__ import annotations

import argparse
import json
import os

from tpugan.cli.common import add_common_args, build_bundle, make_result_dirs


def main(argv=None):
    parser = argparse.ArgumentParser(description="the training args")
    add_common_args(parser, training=True)
    parser.add_argument("--case", type=int, default=1, choices=(1, 2))
    parser.add_argument("--remat", action="store_true",
                        help="rematerialise activations (1024^2 memory knob)")
    parser.add_argument("--remat_policy", default=None, choices=("conv_outs",),
                        help="selective remat: save conv outputs only, "
                             "recompute elementwise chains in the backward")
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 compute for the generator AND the encoder "
                             "forward/backward (fp32 master weights, fp32 norm "
                             "accumulations; +33%% at SG2-1024 case-2, parity gate "
                             "in tests/test_bf16.py)")
    parser.add_argument("--log_every", type=int, default=100)
    parser.add_argument("--checkpoint_every", type=int, default=5000)
    parser.add_argument("--resume", action="store_true",
                        help="resume from the latest step_<N> checkpoint in "
                             "this experiment's models dir (params + optimizer "
                             "state + step + sn; continued trajectory is "
                             "bitwise the unbroken run's — "
                             "tests/test_train.py::test_checkpoint_resume_bitwise). "
                             "Replaces the reference's manual re-launch with "
                             "--checkpoint_dir_E, which loses optimizer state")
    parser.add_argument("--eager_metrics", action="store_true",
                        help="compute the log-only image losses on EVERY "
                             "iteration like the reference's eager loop. By "
                             "default (case 1, where they are detached) "
                             "off-tick steps skip them — the parameter "
                             "trajectory is bitwise identical and the logged "
                             "records unchanged, but each off-tick step drops "
                             "the resynthesis + six VGG16 LPIPS passes")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from tpugan.io.checkpoint import latest_step, load_checkpoint, save_checkpoint
    from tpugan.io.image import save_image_grid, to_unit
    from tpugan.optim import lreq_adam
    from tpugan.ops.eq_lr import lreq_coef_tree
    from tpugan.parallel import auto_mesh
    from tpugan.runtime import to_accelerator
    from tpugan.train import make_encode_fn, make_train_step
    from tpugan.train.e_align import init_train_state

    bundle = build_bundle(args)
    enc_extra = {k: v for k, v in bundle.enc_vars.items() if k != "params"}
    coefs = lreq_coef_tree(bundle.enc_vars["params"], bundle.enc_vars.get("lreq", {}))
    opt = lreq_adam(args.lr, coefs=coefs)

    # ablation ladder presets (ablation_utils/1..8): loss weights and, for
    # step 1, the z-only path with Gm re-mapping (1.E_align_z.py:62-67)
    ab = args.ablation
    image_weights = latent_weights = None
    sequential_image_steps = False
    case = args.case
    synth_fn = bundle.synth
    encode_fn = None
    if ab:
        case = 2  # all ablation scripts backprop image losses
        # 7/8 weights follow the EXECUTED code, not the comment:
        # loss_medium*5 / loss_small*9 with one optimizer step PER group
        # (7.E_align_x_AT1.py:83-86, 8.E_align_x_AT1_AT2.py:83-101)
        image_weights = {
            1: (1.0, 0.0, 0.0), 2: (1.0, 0.0, 0.0), 3: (1.0, 0.0, 0.0),
            4: (1.0, 0.0, 0.0), 5: (1.0, 0.0, 0.0), 6: (1.0, 0.0, 0.0),
            7: (1.0, 5.0, 0.0), 8: (1.0, 5.0, 9.0),
        }[ab]
        latent_weights = {1: (0.0, 1.0), 2: (1.0, 0.0), 3: (1.0, 0.0),
                          4: (1.0, 0.0), 5: (1.0, 1.0), 6: (1.0, 1.0),
                          7: (1.0, 1.0), 8: (1.0, 1.0)}[ab]
        sequential_image_steps = ab in (7, 8)
        if ab == 1:
            assert args.mtype == 1, "ablation 1 (z re-mapping) is StyleGANv1-only"
            base_synth = bundle.synth

            def synth_fn(frozen, key, z):
                return base_synth(frozen, key, z)._replace(const1=z)

            def encode_fn(params, batch, key):
                _, z2 = bundle.encoder.apply(
                    {**enc_extra, "params": params}, batch.imgs1, rngs={"noise": key}
                )
                return z2, bundle.remap(bundle.frozen, z2)

    from tpugan.cli.common import build_lpips_fn

    lpips_fn = build_lpips_fn(args)

    # data axis = largest divisor of the batch that fits the devices —
    # the reference default batch 2 would not divide a 8-chip host
    mesh = auto_mesh(args.batch_size, space=args.space_shards)
    encode_used = encode_fn or make_encode_fn(bundle.encoder, enc_extra)
    resynth_fn = bundle.resynth
    if args.bf16:
        from tpugan.precision import bf16_encode, bf16_pipeline

        synth_fn, resynth_fn = bf16_pipeline(synth_fn, resynth_fn)
        encode_used = bf16_encode(encode_used)
    step = make_train_step(
        encode=encode_used,
        synth=synth_fn,
        resynth=resynth_fn,
        optimizer=opt,
        z_dim=bundle.z_dim,
        batch_size=args.batch_size,
        case=case,
        lpips_fn=lpips_fn,
        mesh=mesh,
        spatial=args.space_shards > 1,
        image_weights=image_weights,
        latent_weights=latent_weights,
        remat=args.remat,
        remat_policy=args.remat_policy,
        sequential_image_steps=sequential_image_steps,
    )
    jitted = jax.jit(step, donate_argnums=(0,))
    jitted_lean = None
    if case == 1 and not ab and not args.eager_metrics:
        # off-tick steps skip the detached (log-only) image branch; the
        # update is bitwise the full step's (make_train_step docstring)
        lean = make_train_step(
            encode=encode_used, synth=synth_fn, resynth=resynth_fn,
            optimizer=opt, z_dim=bundle.z_dim, batch_size=args.batch_size,
            case=case, lpips_fn=None, mesh=mesh,
            spatial=args.space_shards > 1, image_weights=image_weights,
            latent_weights=latent_weights, remat=args.remat,
            remat_policy=args.remat_policy,
            compute_image_losses=False,
        )
        jitted_lean = jax.jit(lean, donate_argnums=(0,))
    from tpugan.train.e_align import make_align_visuals

    # on-tick reconstruction grid, one compiled program per tick (same
    # pattern as e_mis_align's make_mis_align_visuals; an eager op-by-op
    # replay here measurably dents sustained 1024^2 throughput at
    # --log_every 100 with lean off-tick steps)
    visuals = jax.jit(
        make_align_visuals(encode_used, synth_fn, resynth_fn, bundle.z_dim,
                           args.batch_size)
    )
    frozen = bundle.frozen
    if args.bf16:
        from tpugan.precision import bf16_frozen

        frozen = bf16_frozen(frozen)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        placement = NamedSharding(mesh, P())  # replicated over the mesh
    else:
        placement = jax.devices()[0]
    frozen = jax.device_put(frozen, placement)

    name = f"mtype{args.mtype}-{args.img_size}-case{args.case}" + (f"-ab{ab}" if ab else "")
    base, imgs_dir, models_dir = make_result_dirs(args.experiment_dir, name)
    state = init_train_state(bundle.enc_vars["params"], opt, sn=bundle.enc_vars.get("sn"))
    start_iteration = 0
    if args.resume:
        last = latest_step(models_dir)
        if last is None:
            print(f"--resume: no step_<N> checkpoint under {models_dir}, starting fresh")
        else:
            state, last = load_checkpoint(models_dir, state)
            start_iteration = last + 1
            print(f"resumed from {models_dir}/step_{last} (next iteration {start_iteration})")
    state = jax.device_put(state, placement)

    # multi-host: every process launches the SAME jitted programs (SPMD),
    # but only process 0 writes Loss.txt / grids / stdout records —
    # checkpoint saves stay on ALL processes (orbax save barrier; the
    # experiment dir must be a shared path on a real pod)
    from tpugan.runtime import is_primary_host

    primary = is_primary_host()
    loss_log = open(os.path.join(base, "Loss.txt"), "a") if primary else None
    for iteration in range(start_iteration, args.iterations):
        on_tick = iteration % args.log_every == 0
        step_fn = jitted if (on_tick or jitted_lean is None) else jitted_lean
        grid = None
        if on_tick:
            # reconstruction grid like the reference (:282-285): the torch
            # script saves the imgs1/imgs2 computed DURING the iteration,
            # i.e. at pre-update params (with the step's pre-encode power
            # iteration applied to sn) — computed by the jitted visuals fn
            # before the donated step invalidates state's buffers
            import numpy as np

            vis = jax.device_get(
                visuals(state.params, state.sn, jnp.int32(iteration), frozen)
            )
            grid = np.concatenate(
                [np.asarray(to_unit(vis["imgs1"])), np.asarray(to_unit(vis["imgs2"]))],
                axis=0,
            )
        state, info = step_fn(state, jnp.int32(iteration), frozen)
        if on_tick and primary:
            from tpugan.train.e_align import info_scalars

            # the full ~35-scalar set the reference logs per iteration
            # (E_align_cropping_s1.py:233-279), one host sync per log
            rec = {"iteration": iteration, "epoch": iteration // 30000}
            rec.update(info_scalars(info))
            print(json.dumps(rec), flush=True)
            loss_log.write(json.dumps(rec) + "\n")
            loss_log.flush()
            import numpy as np

            save_image_grid(
                os.path.join(imgs_dir, f"ep{iteration // 30000}_iter{iteration % 30000}.jpg"),
                np.clip(grid, 0, 1),
                nrow=args.batch_size,
            )
        if iteration % args.checkpoint_every == 0 and iteration > 0:
            save_checkpoint(models_dir, state, iteration)
    if loss_log is not None:
        loss_log.close()


if __name__ == "__main__":
    main()
