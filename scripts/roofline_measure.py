"""MEASURED HBM-traffic roofline for the headline train steps.

VERDICT r3 weak #5: ``bench.py``'s ``hbm_frac`` uses XLA's pre-fusion
"bytes accessed" counter, which double-counts fused reuse (1.39 at 256²,
physically impossible). This script runs the same steps under a
``jax.profiler`` trace and reports the hardware-measured HBM bytes via
xprof's op_profile (``tpugan.profiling.trace_roofline``).

Usage: python scripts/roofline_measure.py [--skip_1024] [--iters 4]
Prints one JSON line per config.
"""

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from tpugan.runtime import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp


def measure(name, step, state, frozen, iters, bw):
    from tpugan.profiling import trace_roofline
    from tpugan.runtime import to_accelerator

    state = to_accelerator(state)
    frozen = to_accelerator(frozen)
    jitted = jax.jit(step)  # NO donation: trace_roofline re-calls with the same state

    def run():
        return jitted(state, jnp.int32(0), frozen)

    r = trace_roofline(lambda: run(), (), iters=iters)
    out = {
        "metric": name,
        "hbm_bytes_per_step_measured": round(r["hbm_bytes_per_call"]),
        "ms_per_step_device": round(r["seconds_per_call"] * 1e3, 2),
        "measured_hbm_gbps": round(r["measured_hbm_gbps"], 1),
        "hbm_frac_measured": round(r["measured_hbm_gbps"] * 1e9 / bw, 4),
        "mxu_utilization_counter": round(r["mxu_utilization"], 4),
        "program": r["program"],
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--skip_1024", action="store_true")
    args = ap.parse_args()

    import bench

    bw = bench.chip_hbm_bw() or 819e9
    lp = bench.bench_lpips_fn()

    step, state, frozen = bench.build_sg1_step(2, lpips_fn=lp)
    measure("sg1_256_case1_fp32", step, state, frozen, args.iters, bw)

    step, state, frozen = bench.build_sg1_step(
        2, bf16=True, lpips_fn=bench.bench_lpips_fn(bf16=True)
    )
    measure("sg1_256_case1_bf16", step, state, frozen, args.iters, bw)

    if not args.skip_1024:
        step, state, frozen = bench.build_sg2_step(batch=2, res=1024, lpips_fn=lp)
        measure("sg2_1024_case2_fp32", step, state, frozen, args.iters, bw)
        step, state, frozen = bench.build_sg2_step(
            batch=2, res=1024, bf16=True, enc_bf16=True,
            lpips_fn=bench.bench_lpips_fn(bf16=True),
        )
        measure("sg2_1024_case2_bf16", step, state, frozen, args.iters, bw)


if __name__ == "__main__":
    main()
