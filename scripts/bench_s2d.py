"""A/B the space-to-depth conv transform at the SG2-1024 problem shapes.

The round-5 occupancy audit (BASELINE.md) found the SG2-1024 b8 step's
flat tail is conv fusions over 1024²/512² activations with 16/32
channels, each at MXU ≤ 0.3 % — the channel axis fills ≤ 1/4 of the
128-wide lane tile. ``tpugan.ops.s2d.conv_s2d`` computes the SAME conv
on a (H/2, W/2, 4C) tensor. This script measures, per shape class:

  1. direct stride-1 conv (the current form), fwd and fwd+bwd;
  2. conv_s2d with per-op S2D/D2S reshapes (drop-in form);
  3. a 2-conv chain with lrelu between, staying in S2D domain (the
     wiring EncoderBlock would use: reshape only at domain edges).

Run on an idle TPU host (wall-clock methodology per BASELINE.md).
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from tpugan.runtime import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from tpugan.ops.s2d import conv_s2d, depth_to_space, space_to_depth


def timeit_ms(fn, *args, iters=20, best_of=3):
    out = jax.block_until_ready(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(best_of):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


def direct_conv(x, w):
    k = w.shape[0]
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((k // 2, k // 2),) * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    dtype = jnp.dtype(args.dtype)
    n = args.batch
    key = jax.random.PRNGKey(0)

    print(f"device={jax.devices()[0].device_kind} batch={n} dtype={dtype.name}")

    # the three shape classes from the b8 op profile's flat tail
    for (h, c) in [(1024, 16), (1024, 32), (512, 32), (512, 64)]:
        x = jax.random.normal(key, (n, h, h, c), dtype)
        w = (jax.random.normal(key, (3, 3, c, c)) / (9 * c) ** 0.5).astype(dtype)

        f_direct = jax.jit(direct_conv)
        f_s2d = jax.jit(lambda x, w: conv_s2d(x, w))
        t_d = timeit_ms(f_direct, x, w, iters=args.iters)
        t_s = timeit_ms(f_s2d, x, w, iters=args.iters)

        # fwd+bwd through a scalar loss (the training-step usage)
        def loss_direct(x, w):
            return jnp.sum(direct_conv(x, w).astype(jnp.float32) ** 2)

        def loss_s2d(x, w):
            return jnp.sum(conv_s2d(x, w).astype(jnp.float32) ** 2)

        g_d = jax.jit(jax.grad(loss_direct, argnums=(0, 1)))
        g_s = jax.jit(jax.grad(loss_s2d, argnums=(0, 1)))
        tg_d = timeit_ms(g_d, x, w, iters=max(args.iters // 2, 5))
        tg_s = timeit_ms(g_s, x, w, iters=max(args.iters // 2, 5))

        # 2-conv chain staying in S2D domain (reshape at edges only)
        w2 = (jax.random.normal(key, (3, 3, c, c)) / (9 * c) ** 0.5).astype(dtype)

        def chain_direct(x, w, w2):
            h1 = jax.nn.leaky_relu(direct_conv(x, w), 0.2)
            return direct_conv(h1, w2)

        def chain_s2d(x, w, w2):
            h1 = conv_s2d(x, w, out_s2d=True)
            h1 = jax.nn.leaky_relu(h1, 0.2)
            return conv_s2d(h1, w2, in_s2d=True)

        tc_d = timeit_ms(jax.jit(chain_direct), x, w, w2, iters=args.iters)
        tc_s = timeit_ms(jax.jit(chain_s2d), x, w, w2, iters=args.iters)

        print(
            f"{h}x{h} c={c:3d}: fwd {t_d:7.2f} -> {t_s:7.2f} ms "
            f"({t_d / t_s:4.2f}x) | fwd+bwd {tg_d:7.2f} -> {tg_s:7.2f} "
            f"({tg_d / tg_s:4.2f}x) | chain {tc_d:7.2f} -> {tc_s:7.2f} "
            f"({tc_d / tc_s:4.2f}x)",
            flush=True,
        )


if __name__ == "__main__":
    main()
