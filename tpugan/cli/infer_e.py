"""Qualitative encoder evaluation CLI (inferE.py).

``python -m tpugan.cli.infer_e --mtype 1 ...`` — fixed-seed synthetic
images through E, side-by-side grids plus Grad-CAM++ heatmap dumps
(inferE.py:25-212).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from tpugan.cli.common import add_common_args, build_bundle, make_result_dirs


def main(argv=None):
    parser = argparse.ArgumentParser(description="encoder qualitative eval")
    add_common_args(parser, training=True)
    parser.add_argument("--seed_eval", type=int, default=30000)
    parser.add_argument("--count", type=int, default=3)
    parser.add_argument("--gradcam", action="store_true", help="dump CAM heatmaps")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from tpugan.io.image import save_image, save_image_grid, to_unit
    from tpugan.train import make_encode_fn
    from tpugan.utils import iteration_key

    bundle = build_bundle(args)
    enc_extra = {k: v for k, v in bundle.enc_vars.items() if k != "params"}
    encode_fn = make_encode_fn(bundle.encoder, enc_extra)
    base, imgs_dir, _ = make_result_dirs(args.experiment_dir, f"mtype{args.mtype}-inferE")

    vgg = vgg_vars = None
    if args.gradcam:
        from tpugan.cli.common import build_vgg16_vars

        vgg, vgg_vars = build_vgg16_vars(args, args.img_size)

    @jax.jit
    def run(seed, frozen):
        key = iteration_key(seed)
        kz, ke, kg = jax.random.split(key, 3)
        z = jax.random.normal(kz, (args.batch_size, bundle.z_dim))
        batch = bundle.synth(frozen, key, z)
        _, w2 = encode_fn(bundle.enc_vars["params"], batch, ke)
        imgs2 = bundle.resynth(frozen, w2, batch, kg)
        return batch.imgs1, imgs2

    from tpugan.runtime import to_accelerator
    frozen = to_accelerator(bundle.frozen)
    for seed in range(args.seed_eval, args.seed_eval + args.count):
        imgs1, imgs2 = run(jnp.int32(seed), frozen)
        grid = np.concatenate([to_unit(imgs1), to_unit(imgs2)], axis=0)
        save_image_grid(
            os.path.join(imgs_dir, f"infer_seed{seed}.png"), np.clip(grid, 0, 1),
            nrow=args.batch_size,
        )
        if args.gradcam:
            from tpugan.losses.gradcam import grad_cam, mask2cam

            mask = grad_cam(vgg, vgg_vars, imgs1, plus_plus=True)
            heatmap, cam = mask2cam(mask, imgs1)
            save_image_grid(
                os.path.join(imgs_dir, f"cam_seed{seed}.png"),
                np.clip(np.asarray(cam), 0, 1), nrow=args.batch_size,
            )
    print(imgs_dir)


if __name__ == "__main__":
    main()
