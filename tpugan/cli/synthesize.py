"""Validation-grid CLI (synthesized_IMG.py / synthesized_textBigGAN.py).

``python -m tpugan.cli.synthesize --mtype 1 --img_size 256
--start_features 64 --checkpoint_dir_GAN ... --checkpoint_dir_E ...``
renders G(z) vs G(E(G(z))) side-by-side grids on held-out seeds >= 30000.
"""

from __future__ import annotations

import argparse

from tpugan.cli.common import add_common_args, build_bundle, make_result_dirs


def main(argv=None):
    parser = argparse.ArgumentParser(description="synthesized validation grids")
    add_common_args(parser, training=True)
    parser.add_argument("--start_seed", type=int, default=30000)
    parser.add_argument("--count", type=int, default=5)
    args = parser.parse_args(argv)

    import jax

    from tpugan.eval.synthesize import synthesize_grids
    from tpugan.train import make_encode_fn

    bundle = build_bundle(args)
    enc_extra = {k: v for k, v in bundle.enc_vars.items() if k != "params"}
    encode_fn = make_encode_fn(bundle.encoder, enc_extra)

    base, imgs_dir, _ = make_result_dirs(args.experiment_dir, f"mtype{args.mtype}-synth")

    def synth(key, z):
        batch = bundle.synth(key, z)
        return batch, batch.imgs1

    # adapt to synthesize_grids' (synth, encode, resynth) contract
    state = {}

    def synth2(key, z):
        batch = bundle.synth(key, z)
        state["batch"] = batch
        return batch.w1, batch.imgs1

    def encode2(imgs):
        _, w2 = encode_fn(bundle.enc_vars["params"], state["batch"]._replace(imgs1=imgs), jax.random.PRNGKey(0))
        return w2

    def resynth2(w2):
        return bundle.resynth(w2, state["batch"], jax.random.PRNGKey(0))

    paths = synthesize_grids(
        lambda key, z: synth2(key, z),
        encode2,
        resynth2,
        imgs_dir,
        batch_size=args.batch_size,
        z_dim=bundle.z_dim,
        start_seed=args.start_seed,
        count=args.count,
    )
    for p in paths:
        print(p)


if __name__ == "__main__":
    main()
