"""Real-image inversion CLI (embedding_img.py / embedding_v2_*).

``python -m tpugan.cli.embedding --mtype 1 --img_dir ./faces
--checkpoint_dir_GAN ... --checkpoint_dir_E ... [--optimizeE true]
[--beta 0.0002 --norm_p 2]`` — saves per-image w codes (.npy) and
reconstructions, plus the stacked w_all/img_all arrays like the reference
(embedding_img.py:163-170).

Best-loss snapshot artifact differences vs embedding_v2_styleGAN1.py
(ADVICE r4; trajectory semantics are identical and tested,
tests/test_eval_invert.py):
  * only the FINAL minimum's w/grid files are written (the reference
    re-writes a file at every new minimum; the last one wins there too);
  * a baseline snapshot is taken when the tracker arms at
    ``iterations // 2`` even if the reference would have saved nothing
    (it only writes on an improvement after arming);
  * in optimize-w mode the snapshot holds the iteration-INITIAL w1
    (the reference saves the post-update w1 of the improving iteration).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from tpugan.cli.common import add_common_args, build_bundle, make_result_dirs


def str2bool(v) -> bool:
    return str(v).lower() in ("1", "true", "yes")


def main(argv=None):
    parser = argparse.ArgumentParser(description="the training args")
    add_common_args(parser, training=True)
    parser.add_argument("--img_dir", default="./checkpoint/realimg_file/")
    parser.add_argument("--optimizeE", type=str2bool, default=True)
    parser.add_argument("--beta", type=float, default=0.0)
    parser.add_argument("--norm_p", type=float, default=2.0)
    parser.add_argument("--gradcam", action="store_true",
                        help="grad-cam mask/overlay attention terms (embedding_v2_BigGAN)")
    parser.add_argument("--class_id", type=int, default=30,
                        help="BigGAN fixed class id for the inversion condition "
                             "(embedding_v2_BigGAN.py:36, 30 = frog)")
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 frozen-generator compute (+17%% iters/sec at 1024, "
                             "parity-gated: tests/test_bf16.py). NOTE: unlike the "
                             "training CLIs, LPIPS is in the inversion GRADIENT "
                             "path, so --bf16 also changes the optimization "
                             "trajectory slightly; add --fp32_lpips to keep the "
                             "perceptual term fp32")
    parser.add_argument("--fp32_lpips", action="store_true",
                        help="with --bf16: keep the LPIPS backbone fp32 so the "
                             "w/E optimization trajectory matches the fp32 "
                             "perceptual gradients (measured cost ~0 at 1024: "
                             "82.0 vs 82.7 ms/iter, BASELINE.md)")
    parser.set_defaults(iterations=1500, lr=0.01, batch_size=1)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from tpugan.invert import EmbeddingConfig, make_embedder
    from tpugan.io.image import from_unit, save_image, to_unit
    from tpugan.io.native import load_image_dir_fast as load_image_dir
    from tpugan.ops.eq_lr import lreq_coef_tree

    bundle = build_bundle(args)

    from tpugan.parallel import auto_mesh

    # batch defaults to 1 (embedding_img.py:177) — auto_mesh sizes the
    # data axis to a divisor of the batch so the sharding constraints
    # hold at the reference configs; space shards still apply at batch 1
    mesh = auto_mesh(args.batch_size, space=args.space_shards)
    if mesh is not None:
        # replicate the frozen generator / encoder weights over the mesh
        # BEFORE anything closes over them, so every jit input (incl. the
        # derived cond_vector) is consistently mesh-placed
        from jax.sharding import NamedSharding, PartitionSpec as P

        placement = NamedSharding(mesh, P())
        bundle = bundle._replace(
            frozen=jax.device_put(bundle.frozen, placement),
            enc_vars=jax.device_put(bundle.enc_vars, placement),
        )

    enc_extra = {k: v for k, v in bundle.enc_vars.items() if k != "params"}
    coefs = lreq_coef_tree(bundle.enc_vars["params"], bundle.enc_vars.get("lreq", {}))

    # BigGAN inversion conditions: fixed class id, cond_vector built once
    # from truncated z + class embedding (embedding_v2_BigGAN.py:36-47)
    cond_vector = batch_shim = None
    if args.mtype == 4:
        from types import SimpleNamespace

        from tpugan.utils import one_hot, truncated_noise_sample

        embed_kernel = bundle.frozen["params"]["embeddings"]["kernel"]
        num_classes = embed_kernel.shape[0]
        label = one_hot(
            jnp.full((args.batch_size,), args.class_id), num_classes
        )
        zt = truncated_noise_sample(
            jax.random.PRNGKey(args.iterations % 30000),
            args.batch_size, bundle.z_dim, 0.4,
        )
        cond_vector = jnp.concatenate([zt, label @ embed_kernel], axis=1)
        batch_shim = SimpleNamespace(label=label)

    def encode(params, imgs, sn=None):
        variables = {**enc_extra, "params": params}
        if sn is not None:
            variables = {**variables, "sn": sn}
        if cond_vector is not None:
            return bundle.encoder.apply(
                variables, imgs, cond_vector, rngs={"noise": jax.random.PRNGKey(0)}
            )
        return bundle.encoder.apply(
            variables, imgs, rngs={"noise": jax.random.PRNGKey(0)}
        )

    def resynth(frozen, w):
        return bundle.resynth(frozen, w, batch_shim, jax.random.PRNGKey(0))

    frozen_w = bundle.frozen
    if args.bf16:
        from tpugan.precision import bf16_frozen

        base_resynth = resynth

        def resynth(frozen, w):
            return base_resynth(frozen, w.astype(jnp.bfloat16)).astype(jnp.float32)

        frozen_w = bf16_frozen(frozen_w)
        if args.optimizeE:
            # fine-tune-E backprops through E every iteration, so bf16
            # encoder compute is the same lever the training CLIs use
            # (e_align.py:101); fp32 master weights + LREQAdam state
            from tpugan.precision import bf16_encode_images

            encode = bf16_encode_images(encode)
            if cond_vector is not None:
                # E_BIG's closure-captured condition must follow the
                # compute dtype too, or every cond-conditioned layer
                # silently promotes back to fp32 (bf16_encode casts the
                # train-step const1 for the same reason)
                cond_vector = cond_vector.astype(jnp.bfloat16)

    vgg = vgg_vars = None
    if args.gradcam:
        from tpugan.cli.common import build_vgg16_vars

        vgg, vgg_vars = build_vgg16_vars(args, args.img_size)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            vgg_vars = jax.device_put(vgg_vars, NamedSharding(mesh, P()))

    cfg = EmbeddingConfig(
        iterations=args.iterations,
        lr=args.lr,
        optimize_e=args.optimizeE,
        beta=args.beta,
        norm_p=args.norm_p,
        attention="gradcam" if args.gradcam else "crops",
    )
    from tpugan.cli.common import build_lpips_fn

    invert = make_embedder(
        encode, resynth, bundle.enc_vars["params"], coefs, cfg,
        lpips_fn=build_lpips_fn(args),
        vgg=vgg, vgg_vars=vgg_vars, frozen=frozen_w,
        sn0=bundle.enc_vars.get("sn"),
        mesh=mesh, spatial=args.space_shards > 1,
    )

    images = load_image_dir(args.img_dir, args.img_size)
    images = from_unit(images)

    base, imgs_dir, models_dir = make_result_dirs(
        args.experiment_dir, f"mtype{args.mtype}-embedding"
    )
    from tpugan.io.image import save_image_grid

    w_all, img_all = [], []
    bs = args.batch_size
    for g in range(len(images) // bs):
        batch = jnp.asarray(images[g * bs : (g + 1) * bs])

        def save_cadence(iteration, w_c, imgs2_c, g=g, batch=batch):
            # per-100-iteration w/img dumps (embedding_img.py:142-160:
            # id%d-i%d-w%d.pt / id%d-i%d-img%d.pt + the comparison grid)
            for i in range(bs):
                np.save(
                    os.path.join(models_dir, f"id{g}-i{i}-w{iteration}.npy"),
                    np.asarray(w_c[i]),
                )
                np.save(
                    os.path.join(models_dir, f"id{g}-i{i}-img{iteration}.npy"),
                    np.asarray(imgs2_c[i]),
                )
            grid = np.concatenate([to_unit(batch), to_unit(imgs2_c)], axis=0)
            save_image_grid(
                os.path.join(imgs_dir, f"id{g}_ep{iteration}.jpg"),
                np.clip(np.asarray(grid), 0, 1), nrow=bs,
            )

        result = invert(batch, chunk_callback=save_cadence)
        for i in range(bs):
            np.save(os.path.join(models_dir, f"id{g}-i{i}-w.npy"), np.asarray(result.w[i]))
            save_image(
                os.path.join(imgs_dir, f"{str(g).rjust(5, '0')}_rec.png"),
                np.clip(to_unit(result.images[i]), 0, 1),
            )
        # best-loss snapshot: the v2 pipeline ships the BEST w along the
        # trajectory (embedding_v2_styleGAN1.py:127-135), not the last —
        # w code + comparison grid at the min, one loss_min.txt line per
        # new minimum (armed at iterations/2, 5% improvement threshold)
        if int(result.iter_best) >= 0 and np.isfinite(float(result.loss_best)):
            it_b = int(result.iter_best)
            lb = float(result.loss_best)
            wn = float(np.linalg.norm(np.asarray(result.w_best)))
            np.save(
                os.path.join(
                    models_dir, f"id{g}-iter{it_b}-norm{wn:.6f}-imgLoss-min{lb:.6f}.npy"
                ),
                np.asarray(result.w_best),
            )
            imgs_best = resynth(frozen_w, result.w_best)
            grid = np.concatenate([to_unit(batch), to_unit(imgs_best)], axis=0)
            save_image_grid(
                os.path.join(
                    imgs_dir, f"id{g}_ep{it_b}-norm{wn:.2f}-imgLoss-min{lb:.6f}.jpg"
                ),
                np.clip(np.asarray(grid), 0, 1), nrow=bs,
            )
            msiv = np.asarray(result.msiv_history)
            wnorms = np.asarray(result.wnorm_history)
            with open(os.path.join(base, "loss_min.txt"), "a") as f:
                # one line per new minimum, like the reference (:134-135);
                # the arm iteration itself writes nothing
                for it_i in np.nonzero(np.asarray(result.improved_history))[0]:
                    f.write(
                        f"ep{g}_iter{int(it_i)}_minImg{float(msiv[it_i]):.5f}"
                        f"_wNorm{float(wnorms[it_i]):f}\n"
                    )
        w_all.append(np.asarray(result.w[0]))
        img_all.append(np.asarray(result.images[0]))
        print(f"image group {g}: final losses {jax.tree.map(float, result.losses[-1])}")
    np.save(os.path.join(models_dir, "w_all.npy"), np.stack(w_all))
    np.save(os.path.join(models_dir, "img_all.npy"), np.stack(img_all))


if __name__ == "__main__":
    main()
