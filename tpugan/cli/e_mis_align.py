"""Mis-aligned (Grad-CAM) encoder training CLI (E_mis_align_cropping_s1.py).

``python -m tpugan.cli.e_mis_align --mtype 1 --img_size 256
--start_features 64 --vgg_weights vgg16.pth ...`` — random VGG weights are
used when none are supplied (smoke runs).
"""

from __future__ import annotations

import argparse
import json
import os

from tpugan.cli.common import add_common_args, build_bundle, make_result_dirs


def main(argv=None):
    parser = argparse.ArgumentParser(description="the training args")
    add_common_args(parser, training=True)
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 compute for generator, encoder AND the "
                             "CAM++/GBP VGG stack (attention losses are "
                             "log-only, so the update trajectory is bitwise "
                             "fp32; gate in tests/test_train.py)")
    parser.add_argument("--log_every", type=int, default=100)
    parser.add_argument("--checkpoint_every", type=int, default=5000)
    parser.add_argument("--resume", action="store_true",
                        help="resume from the latest step_<N> checkpoint in "
                             "this experiment's models dir (params + optimizer "
                             "state + step + sn; bitwise-continuation gate in "
                             "tests/test_train.py)")
    parser.add_argument("--eager_metrics", action="store_true",
                        help="compute the log-only attention/image losses on "
                             "EVERY iteration like the reference. By default "
                             "off-tick steps skip the whole CAM++/GBP/image "
                             "stack (log-only by construction) — trajectory "
                             "bitwise identical, logged records unchanged")
    args = parser.parse_args(argv)
    # reference default batch for the mis-align script is 5 (:307-310)
    if args.batch_size == 2:
        args.batch_size = 5

    import jax
    import jax.numpy as jnp

    from tpugan.io.checkpoint import latest_step, load_checkpoint, save_checkpoint
    from tpugan.optim import lreq_adam
    from tpugan.ops.eq_lr import lreq_coef_tree
    from tpugan.train import make_encode_fn, make_mis_align_step
    from tpugan.train.e_align import init_train_state

    bundle = build_bundle(args)
    enc_extra = {k: v for k, v in bundle.enc_vars.items() if k != "params"}
    coefs = lreq_coef_tree(bundle.enc_vars["params"], bundle.enc_vars.get("lreq", {}))
    opt = lreq_adam(args.lr, coefs=coefs)

    from tpugan.cli.common import build_lpips_fn, build_vgg16_vars

    vgg, vgg_vars = build_vgg16_vars(args, args.img_size)
    if args.bf16:
        # --bf16 extends to the CAM++/GBP VGG stack (4x VGG fwd+bwd per
        # iteration, the step's dominant byte stream): the attention
        # losses are log-only, so the parameter trajectory is bitwise the
        # fp32 one (tests/test_train.py::test_mis_align_cam_bf16_close);
        # measured 92.1 -> 84.5 ms/step at the reference batch-5 config
        from tpugan.precision import cast_floating

        vgg_vars = cast_floating(vgg_vars, jnp.bfloat16)
    # guided-backprop twin: same params, clamped ReLU backward
    # (grad_cam.py:196-232); drives the logged loss_grad group + gb dumps
    from tpugan.losses.vgg import VGG16

    vgg_guided = VGG16(guided=True)

    from tpugan.parallel import auto_mesh

    # reference batch is 5 (E_mis_align_cropping_s1.py:308) — auto_mesh
    # sizes the data axis to a divisor (5 on >=5-device hosts) instead
    # of crashing on 2/4/8-device data axes; --space_shards is honored
    # like the other training CLIs
    mesh = auto_mesh(args.batch_size, space=args.space_shards)
    encode_used = make_encode_fn(bundle.encoder, enc_extra)
    synth_used, resynth_used = bundle.synth, bundle.resynth
    if args.bf16:
        from tpugan.precision import bf16_encode, bf16_pipeline

        synth_used, resynth_used = bf16_pipeline(synth_used, resynth_used)
        encode_used = bf16_encode(encode_used)
    lpips_fn = build_lpips_fn(args)
    step = make_mis_align_step(
        encode=encode_used,
        synth=synth_used,
        resynth=resynth_used,
        optimizer=opt,
        vgg=vgg,
        z_dim=bundle.z_dim,
        batch_size=args.batch_size,
        lpips_fn=lpips_fn,
        vgg_guided=vgg_guided,
        mesh=mesh,
        spatial=args.space_shards > 1,
        cam_bf16=args.bf16,
    )
    # donate the train state: params + optimizer state are updated in
    # place each step (the visual dumps below read state BEFORE the step,
    # so donation is safe; same pattern as cli/e_align.py)
    jitted = jax.jit(step, donate_argnums=(0,))
    jitted_lean = None
    if not args.eager_metrics:
        # the lean step never evaluates image losses, so no lpips_fn
        lean = make_mis_align_step(
            encode=encode_used, synth=synth_used, resynth=resynth_used,
            optimizer=opt, vgg=vgg, z_dim=bundle.z_dim,
            batch_size=args.batch_size, lpips_fn=None,
            vgg_guided=vgg_guided, mesh=mesh,
            spatial=args.space_shards > 1, cam_bf16=args.bf16,
            compute_attention_losses=False,
        )
        jitted_lean = jax.jit(lean, donate_argnums=(0,))
    from tpugan.train.e_mis_align import make_mis_align_visuals

    visuals = jax.jit(
        make_mis_align_visuals(
            encode_used, synth_used, resynth_used, vgg, vgg_guided,
            bundle.z_dim, args.batch_size,
        )
    )
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        placement = NamedSharding(mesh, P())  # replicated over the mesh
    else:
        placement = jax.devices()[0]
    vgg_vars = jax.device_put(vgg_vars, placement)
    frozen = bundle.frozen
    if args.bf16:
        from tpugan.precision import bf16_frozen

        frozen = bf16_frozen(frozen)
    frozen = jax.device_put(frozen, placement)

    name = f"mtype{args.mtype}-{args.img_size}-misalign"
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
    # but only process 0 writes artifacts (see runtime.is_primary_host)
    from tpugan.runtime import is_primary_host

    primary = is_primary_host()
    loss_log = open(os.path.join(base, "Loss.txt"), "a") if primary else None
    for iteration in range(start_iteration, args.iterations):
        on_tick = iteration % args.log_every == 0
        step_fn = jitted if (on_tick or jitted_lean is None) else jitted_lean
        vis = None
        if on_tick:
            # visual dumps use the PRE-update params, like the reference's
            # in-iteration dumps (E_mis_align_cropping_s1.py:276-288 saves
            # the tensors computed during the iteration, before .step()).
            # Must run before the donated step invalidates state's buffers.
            vis = jax.device_get(
                visuals(state.params, state.sn, jnp.int32(iteration), frozen, vgg_vars)
            )
        state, info = step_fn(state, jnp.int32(iteration), frozen, vgg_vars)
        if on_tick and primary:
            from tpugan.train.e_align import info_scalars

            # full per-group scalar set (E_mis_align_cropping_s1.py logs
            # the same ~35 tensorboard scalars as the aligned script)
            rec = {"iteration": iteration, "epoch": iteration // 30000}
            rec.update(info_scalars(info))
            print(json.dumps(rec), flush=True)
            loss_log.write(json.dumps(rec) + "\n")
            loss_log.flush()
            # reconstruction grid + heatmap/CAM/guided-backprop dumps
            # (E_mis_align_cropping_s1.py:276-288); vis was computed above
            # at the iteration's initial params
            import numpy as np

            from tpugan.io.image import save_image_grid, to_unit

            grid = np.concatenate([to_unit(vis["imgs1"]), to_unit(vis["imgs2"])], axis=0)
            ep, it = iteration // 30000, iteration % 30000
            save_image_grid(
                os.path.join(imgs_dir, f"ep{ep}_iter{it}.png"),
                np.clip(grid, 0, 1), nrow=args.batch_size,
            )
            cam_dir = os.path.join(base, "grad_cam")
            os.makedirs(cam_dir, exist_ok=True)
            save_image_grid(
                os.path.join(cam_dir, f"heatmap_{iteration}.png"),
                np.clip(np.asarray(vis["heatmap"]), 0, 1), nrow=args.batch_size,
            )
            save_image_grid(
                os.path.join(cam_dir, f"cam_{iteration}.png"),
                np.clip(np.asarray(vis["cam"]), 0, 1), nrow=args.batch_size,
            )
            # the reference's host-side normalisation of the gb dump
            # (:282-284): ``grads -= np.max(np.min(grads), 0)`` — the 0 is
            # numpy's AXIS arg on a scalar, i.e. subtract the true min
            gb = np.array(vis["gb"], dtype=np.float32)  # writable copy
            gb -= float(gb.min())
            denom = float(gb.max())
            if denom != 0.0:
                gb /= denom
            save_image_grid(
                os.path.join(cam_dir, f"gb_{iteration}.png"),
                np.clip(gb, 0, 1), nrow=args.batch_size,
            )
        if iteration % args.checkpoint_every == 0 and iteration > 0:
            save_checkpoint(models_dir, state, iteration)
    if loss_log is not None:
        loss_log.close()


if __name__ == "__main__":
    main()
