"""End-to-end comparing-baseline workflow demo (comparing-baseline.py:64-88).

Synthesizes image pairs with a random-init StyleGANv1, writes two image
directories (originals and reconstruction-style perturbed copies), runs the
``tpugan.cli.compare`` metric table over them, and checks:

  * the identity fixpoint the reference documents at
    comparing-baseline.py:88 — equal dirs give psnr ~88.13, ssim 1.0,
    mse 0, cosine ~1.000001;
  * a perturbed pair produces the expected metric ordering
    (psnr finite and lower, ssim < 1, mse > 0).

Usage: python scripts/demo_compare.py [--img_size 64] [--n 4] [--outdir D]
"""

import argparse
import json
import os
import pathlib
import shutil
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from tpugan.runtime import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np


def synthesize_pairs(img_size: int, n: int, key):
    from tpugan.models import StyleGANv1Generator, StyleGANv1Mapping

    import math

    layer_count = int(math.log2(img_size)) - 1
    gen = StyleGANv1Generator(startf=16, maxf=64, layer_count=layer_count, latent_size=64)
    gm = StyleGANv1Mapping(
        num_layers=2 * layer_count, mapping_layers=4, latent_size=64,
        dlatent_size=64, mapping_fmaps=64,
    )
    kp, kn, kz = jax.random.split(key, 3)
    gm_vars = gm.init(kp, jnp.zeros((1, 64)))
    gvars = gen.init({"params": kp, "noise": kn}, jnp.zeros((1, 2 * layer_count, 64)))
    z = jax.random.normal(kz, (n, 64))
    w = gm.apply(gm_vars, z)
    imgs = gen.apply(gvars, w, layer_count - 1, rngs={"noise": kn})
    return np.asarray(imgs)


def write_dir(path, imgs):
    from tpugan.io.image import save_image, to_unit

    os.makedirs(path, exist_ok=True)
    for i, img in enumerate(imgs):
        save_image(os.path.join(path, f"{i:05d}.png"), np.clip(to_unit(img), 0, 1))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--img_size", type=int, default=64)
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--outdir", default=None)
    args = ap.parse_args(argv)

    out = args.outdir or tempfile.mkdtemp(prefix="tpugan_compare_")
    d1 = os.path.join(out, "originals")
    d2 = os.path.join(out, "identical")
    d3 = os.path.join(out, "perturbed")

    imgs = synthesize_pairs(args.img_size, args.n, jax.random.PRNGKey(0))
    write_dir(d1, imgs)
    write_dir(d2, imgs)
    noise = 0.1 * np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), imgs.shape)
    )
    write_dir(d3, imgs + noise)

    from tpugan.eval.compare import compare_dirs

    ident = compare_dirs(d1, d2, args.img_size)
    pert = compare_dirs(d1, d3, args.img_size)
    print("identity :", json.dumps(ident))
    print("perturbed:", json.dumps(pert))

    # the reference's documented fixpoint (comparing-baseline.py:88)
    assert ident["psnr"] > 80.0 or ident["psnr"] == float("inf"), ident
    assert abs(ident["ssim"] - 1.0) < 1e-5, ident
    assert ident["mse"] < 1e-6, ident
    assert abs(ident["cosine"] - 1.0) < 1e-4, ident

    assert pert["psnr"] < ident["psnr"], (pert, ident)
    assert pert["ssim"] < 0.999, pert
    assert pert["mse"] > 0, pert
    print("demo_compare OK:", out)
    if args.outdir is None:
        shutil.rmtree(out)


if __name__ == "__main__":
    main()
