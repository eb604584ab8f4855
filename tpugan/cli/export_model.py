"""Serving-artifact export CLI (no reference counterpart — the reference
ships Python + torch checkpoints; this emits a self-contained StableHLO
artifact via jax.export, loadable without tpugan or the weights).

``python -m tpugan.cli.export_model --mtype 1 --img_size 256
--start_features 64 --checkpoint_dir_GAN ... --out g.stablehlo``
exports the frozen w -> image synthesis (mtype 4: (z, one-hot label) ->
image). ``--what encode`` exports the encoder image -> (const, w)
forward instead. ``--platforms tpu`` (repeatable) targets other
platforms than the exporting host.

Artifact call conventions (consumers of OLD artifacts, re-export):
  * synthesis: ``f(w)`` — mtype 4 takes ``f(z, label)``.
  * encode: ``f(imgs)`` for mtype 1/2/3 since round 3 (earlier artifacts
    took ``f(imgs, const1)``; non-conditional encoders never read const1,
    so the dead input was dropped — old two-input artifacts still run but
    new exports use the one-input signature). mtype 4 (conditional E_BIG)
    keeps ``f(imgs, cond)``.
"""

from __future__ import annotations

import argparse

from tpugan.cli.common import add_common_args, build_bundle


def main(argv=None):
    parser = argparse.ArgumentParser(description="export a serving artifact")
    add_common_args(parser, training=True)
    parser.add_argument("--out", required=True, help="output artifact path")
    parser.add_argument("--what", default="synthesis",
                        choices=("synthesis", "encode"))
    parser.add_argument("--platforms", action="append", default=None,
                        help="lowering platform(s), e.g. --platforms tpu "
                             "--platforms cpu; default: the current backend")
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 generator compute baked into the artifact")
    parser.add_argument("--check", action="store_true",
                        help="reload the artifact and compare one call "
                             "against the live jitted function")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpugan.io.export import load_exported_file, save_exported
    from tpugan.train import make_encode_fn

    bundle = build_bundle(args)
    frozen = bundle.frozen
    resynth = bundle.resynth
    if args.bf16:
        from tpugan.precision import bf16_frozen, bf16_pipeline

        _, resynth = bf16_pipeline(bundle.synth, resynth)
        frozen = bf16_frozen(frozen)

    if args.what == "synthesis":
        if args.mtype == 4:
            # conditional: batch = (label,) shim like the embedding CLI
            from types import SimpleNamespace

            from tpugan.utils import one_hot

            num_classes = bundle.frozen["params"]["embeddings"]["kernel"].shape[0]

            def fn(w, label):
                return resynth(frozen, w, SimpleNamespace(label=label), jax.random.PRNGKey(0))

            # bundle.z_dim, not args.z_dim: a --config_dir JSON (or the
            # BigGAN default 128) overrides the flag's 512 default
            example = (
                jnp.zeros((args.batch_size, bundle.z_dim)),
                one_hot(jnp.zeros((args.batch_size,), jnp.int32), num_classes),
            )
        else:

            def fn(w):
                return resynth(frozen, w, None, jax.random.PRNGKey(0))

            if args.mtype == 3:  # PGGAN resynthesizes from flat z
                example = (jnp.zeros((args.batch_size, bundle.z_dim)),)
            else:
                example = (
                    jnp.zeros((args.batch_size, bundle.num_style_layers, bundle.z_dim)),
                )
    else:
        enc_extra = {k: v for k, v in bundle.enc_vars.items() if k != "params"}
        encode = make_encode_fn(bundle.encoder, enc_extra)
        from types import SimpleNamespace

        sn = bundle.enc_vars.get("sn")

        if args.mtype == 4:
            # E_BIG's conditional-BN input is 2*z_dim (cond_vector;
            # E_BIG.py:207) — part of the serving signature
            def fn(imgs, const1):
                batch = SimpleNamespace(imgs1=imgs, const1=const1)
                if sn is not None:
                    return encode(bundle.enc_vars["params"], batch, jax.random.PRNGKey(0), sn)
                return encode(bundle.enc_vars["params"], batch, jax.random.PRNGKey(0))

            example = (
                jnp.zeros((args.batch_size, args.img_size, args.img_size, 3)),
                jnp.zeros((args.batch_size, 2 * bundle.z_dim)),
            )
        else:
            # non-conditional encoders (mtype 1/2/3) never read const1 —
            # the artifact signature takes images only
            def fn(imgs):
                batch = SimpleNamespace(imgs1=imgs, const1=None)
                if sn is not None:
                    return encode(bundle.enc_vars["params"], batch, jax.random.PRNGKey(0), sn)
                return encode(bundle.enc_vars["params"], batch, jax.random.PRNGKey(0))

            example = (
                jnp.zeros((args.batch_size, args.img_size, args.img_size, 3)),
            )

    save_exported(args.out, fn, *example, platforms=args.platforms)
    print(f"exported {args.what} -> {args.out}")

    if args.check:
        g = load_exported_file(args.out)
        live = jax.jit(fn)
        got, want = g(*example), live(*example)
        for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        print("check ok: artifact matches the live jitted function")


if __name__ == "__main__":
    main()
