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
    parser.add_argument("--fp32", action="store_true",
                        help="disable the default bf16 generator compute "
                             "(bf16 is parity-gated: tests/test_bf16.py)")
    args = parser.parse_args(argv)

    import jax

    from tpugan.eval.synthesize import synthesize_grids
    from tpugan.train import make_encode_fn

    bundle = build_bundle(args)
    enc_extra = {k: v for k, v in bundle.enc_vars.items() if k != "params"}
    encode_fn = make_encode_fn(bundle.encoder, enc_extra)
    synth_fn, resynth_fn, frozen_w = bundle.synth, bundle.resynth, bundle.frozen
    if not args.fp32 and jax.default_backend() == "tpu":
        # frozen generators default to bf16 on TPU (recon SSIM/PSNR gated
        # within +-0.5% of fp32); CPU/GPU backends emulate bf16 slowly,
        # so they stay fp32 unless asked
        print(
            "note: bf16 generator compute auto-enabled on TPU — outputs are "
            "not bitwise-comparable to the fp32 reference pipeline; pass "
            "--fp32 when comparing against reference-produced images",
            flush=True,
        )
        from tpugan.precision import bf16_frozen, bf16_pipeline

        synth_fn, resynth_fn = bf16_pipeline(synth_fn, resynth_fn)
        frozen_w = bf16_frozen(frozen_w)

    base, imgs_dir, _ = make_result_dirs(args.experiment_dir, f"mtype{args.mtype}-synth")

    # one jitted step per seed: z -> G -> E -> G, grids saved on host
    import numpy as np

    from tpugan.io.image import save_image_grid, to_unit
    from tpugan.utils import iteration_key

    @jax.jit
    def step(seed, frozen):
        key = iteration_key(seed)
        kz, ke, kg = jax.random.split(key, 3)
        z = jax.random.normal(kz, (args.batch_size, bundle.z_dim))
        batch = synth_fn(frozen, key, z)
        _, w2 = encode_fn(bundle.enc_vars["params"], batch, ke)
        imgs2 = resynth_fn(frozen, w2, batch, kg)
        return batch.imgs1, imgs2

    import jax.numpy as jnp

    from tpugan.runtime import to_accelerator
    frozen = to_accelerator(frozen_w)
    paths = []
    for seed in range(args.start_seed, args.start_seed + args.count):
        imgs1, imgs2 = step(jnp.int32(seed), frozen)
        grid = np.concatenate([to_unit(imgs1), to_unit(imgs2)], axis=0)
        path = f"{imgs_dir}/seed{seed}.png"
        save_image_grid(path, np.clip(grid, 0, 1), nrow=args.batch_size)
        paths.append(path)
    for p in paths:
        print(p)


if __name__ == "__main__":
    main()
