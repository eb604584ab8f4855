"""One-shot real-image reconstruction CLI (rec_real_img.py).

``python -m tpugan.cli.rec_real_img --mtype 1 --img_dir ./faces ...`` —
E(img) -> w -> G(w), no optimization; saves real/rec pairs.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from tpugan.cli.common import add_common_args, build_bundle, make_result_dirs


def main(argv=None):
    parser = argparse.ArgumentParser(description="one-shot reconstruction")
    add_common_args(parser, training=True)
    parser.add_argument("--img_dir", required=True)
    parser.set_defaults(batch_size=1)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from tpugan.io.image import from_unit, save_image, to_unit
    from tpugan.io.native import load_image_dir_fast as load_image_dir

    bundle = build_bundle(args)
    enc_extra = {k: v for k, v in bundle.enc_vars.items() if k != "params"}

    # weights as jit arguments, not closure-captured program constants
    @jax.jit
    def reconstruct(imgs, enc_params, frozen):
        _, w = bundle.encoder.apply(
            {**enc_extra, "params": enc_params}, imgs,
            rngs={"noise": jax.random.PRNGKey(0)},
        )
        return bundle.resynth(frozen, w, None, jax.random.PRNGKey(0)), w

    images = from_unit(load_image_dir(args.img_dir, args.img_size))
    base, imgs_dir, models_dir = make_result_dirs(args.experiment_dir, f"mtype{args.mtype}-rec")
    bs = args.batch_size
    for g in range(len(images) // bs):
        batch = jnp.asarray(images[g * bs : (g + 1) * bs])
        rec, w = reconstruct(batch, bundle.enc_vars["params"], bundle.frozen)
        for i in range(bs):
            save_image(
                os.path.join(imgs_dir, f"{g * bs + i:05d}_real.png"),
                np.clip(to_unit(np.asarray(batch[i])), 0, 1),
            )
            save_image(
                os.path.join(imgs_dir, f"{g * bs + i:05d}_rec.png"),
                np.clip(to_unit(np.asarray(rec[i])), 0, 1),
            )
            np.save(os.path.join(models_dir, f"{g * bs + i:05d}_w.npy"), np.asarray(w[i]))
    print(imgs_dir)


if __name__ == "__main__":
    main()
