"""Image2StyleGAN baseline: direct w+ optimization against a frozen G.

Rebuild of baseline_utils/image2stylegan_w2z_opW.py (the one baseline the
reference can run standalone; the ALAE/pSp/In-Domain harnesses are scripts
meant to be dropped into those external repos, SURVEY.md §4.5). This is
the pure per-image w-optimization (no encoder at all): w initialised at
zero (or the mapping mean), MSE+perceptual objective, Adam.

``python -m tpugan.cli.baseline_i2s --mtype 1 --img_dir ./faces ...``

Note: with ``--random_init`` the loss goes NaN by design of the task, not a
framework bug — an untrained G emits exactly-zero activations at w=0 (noise
weights and biases init at 0, so instance-norm of the constant input zeroes
everything), and each IN at zero spatial variance amplifies the backward by
~1/sqrt(eps); past ~4 blocks that overflows fp32. The torch reference has
the identical degeneracy. Real (trained) checkpoints never hit it.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from tpugan.cli.common import add_common_args, build_bundle, make_result_dirs


def main(argv=None):
    parser = argparse.ArgumentParser(description="image2stylegan w optimization")
    add_common_args(parser, training=True)
    parser.add_argument("--img_dir", required=True)
    parser.set_defaults(iterations=1000, lr=0.01, batch_size=1)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from tpugan.io.image import from_unit, save_image, to_unit
    from tpugan.io.native import load_image_dir_fast as load_image_dir
    from tpugan.losses.space_loss import space_loss

    bundle = build_bundle(args)

    def resynth(frozen, w):
        return bundle.resynth(frozen, w, None, jax.random.PRNGKey(0))

    opt = optax.adam(args.lr)

    # frozen G weights ride as jit arguments (device buffers), not baked
    # program constants — keeps the compile payload small at 1024²
    @jax.jit
    def run_opt(w, opt_state, target, frozen):
        def one(carry, _):
            w, opt_state = carry

            def loss_fn(w):
                rec = resynth(frozen, w)
                l, _ = space_loss(target, rec)
                return l

            loss, g = jax.value_and_grad(loss_fn)(w)
            updates, opt_state = opt.update(g, opt_state, w)
            w = optax.apply_updates(w, updates)
            return (w, opt_state), loss

        (w, opt_state), losses = jax.lax.scan(one, (w, opt_state), None, length=100)
        return w, opt_state, losses[-1]

    images = from_unit(load_image_dir(args.img_dir, args.img_size))
    base, imgs_dir, models_dir = make_result_dirs(
        args.experiment_dir, f"mtype{args.mtype}-i2s"
    )
    for g in range(len(images)):
        target = jnp.asarray(images[g : g + 1])
        w = jnp.zeros((1, bundle.num_style_layers, 512))
        opt_state = opt.init(w)
        for _ in range(max(1, args.iterations // 100)):
            w, opt_state, loss = run_opt(w, opt_state, target, bundle.frozen)
        rec = resynth(bundle.frozen, w)
        np.save(os.path.join(models_dir, f"{g:05d}_w.npy"), np.asarray(w[0]))
        save_image(
            os.path.join(imgs_dir, f"{g:05d}_rec.png"),
            np.clip(to_unit(np.asarray(rec[0])), 0, 1),
        )
        print(f"image {g}: final loss {float(loss):.4f}")


if __name__ == "__main__":
    main()
