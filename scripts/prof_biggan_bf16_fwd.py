"""Isolate the bf16 BigGAN-512 forward pathology.

Times model.apply at 256/512 with (weights dtype x input dtype) in
{fp32, bf16}^2, plus a per-segment split of the bf16 forward.

Usage: python scripts/prof_biggan_bf16_fwd.py [--img_size 512]
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from tpugan.runtime import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp


from tpugan.profiling import timeit_ms as timeit  # shared best-of-3 methodology


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img_size", type=int, default=512, choices=(128, 256, 512))
    ap.add_argument("--batch", type=int, default=2)
    args = ap.parse_args()

    from tpugan.models import BigGAN, BigGANConfig
    from tpugan.precision import bf16_frozen
    from tpugan.runtime import to_accelerator

    cfg = BigGANConfig.for_resolution(args.img_size, z_dim=128)
    model = BigGAN(cfg)
    key = jax.random.PRNGKey(0)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        gvars = jax.jit(lambda z, l: model.init(key, z, l, 0.4))(
            jnp.zeros((1, 128)), jnp.zeros((1, 1000))
        )

    f32 = to_accelerator(gvars)
    f16 = to_accelerator(bf16_frozen(gvars))
    z32 = to_accelerator(jax.random.normal(key, (args.batch, 128)))
    z16 = z32.astype(jnp.bfloat16)
    l32 = to_accelerator(jax.nn.one_hot(jnp.zeros((args.batch,), jnp.int32), 1000))
    l16 = l32.astype(jnp.bfloat16)

    fwd = jax.jit(lambda fr, z, l: model.apply(fr, z, l, 0.4)[0])
    print(f"w=f32 x=f32 : {timeit(fwd, f32, z32, l32):8.1f} ms")
    print(f"w=bf16 x=f32: {timeit(fwd, f16, z32, l32):8.1f} ms")
    print(f"w=bf16 x=bf16: {timeit(fwd, f16, z16, l16):8.1f} ms")


if __name__ == "__main__":
    main()
