"""SG2-1024 case-2 b8/bf16 occupancy-floor experiments (VERDICT r5 ask #4).

The round-4 measured roofline put the flagship step at 9.2% MXU /
0.18 hbm_frac — neither wall binds; the time sits in chains of
movement-dominated fusions. Three experiments, each measured on the FULL
step at the b8/bf16 operating point (the prior "XLA fusion wins" verdicts
date from batch-2 fp32):

  (i)  Pallas FIR kernels in-context (``TPUGAN_PALLAS=1``);
  (ii) the copy/pad/broadcast tail: op-level profile + donation;
  (iii) XLA scheduler knobs (latency-hiding scheduler et al.).

Env-dependent variants (XLA_FLAGS, TPUGAN_PALLAS) need a fresh backend,
so the parent re-execs itself per variant: ``--variant all`` orchestrates;
``--variant <name>`` measures one configuration and prints a JSON line.
"""

import argparse
import json
import os
import pathlib
import subprocess
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

VARIANTS = {
    # name: (env overrides, xla flags appended, extra measure args)
    "baseline": ({}, "", {}),
    "pallas": ({"TPUGAN_PALLAS": "1"}, "", {}),
    "lhs": ({}, "--xla_tpu_enable_latency_hiding_scheduler=true", {}),
    "lhs_off": ({}, "--xla_tpu_enable_latency_hiding_scheduler=false", {}),
    # the baseline b8 op profile shows XLA auto-remat/compression rows
    # (fusion.4005.remat_{un,}compressed etc., ~9% of step time): the b8
    # step sits near the HBM wall (b16 OOMs at 32.5/15.75 GB) and XLA is
    # trading time for memory. Explicit remat relieves the squeeze — the
    # round-3 "-9%" verdict was measured at b2 where nothing was squeezed.
    "remat_conv": ({}, "", {"remat_policy": "conv_outs"}),
    "remat_full": ({}, "", {"remat": True}),
    "donate": ({}, "", {"donate": True}),
    # space-to-depth domain for the lane-starved top-of-pyramid convs
    # (ops/s2d.py): E_Blur's 16ch@1024²/32ch@512² blocks run fully in
    # S2D domain; the G's 32ch@1024² stride-1 ModulatedConv drops in
    "s2d": ({"TPUGAN_S2D": "1"}, "", {}),
    # wider policy: also the 64ch@256² block
    "s2d_wide": ({"TPUGAN_S2D": "1", "TPUGAN_S2D_MIN_H": "256",
                  "TPUGAN_S2D_MAX_C": "64"}, "", {}),
}


def run_variant(name, batch, res, profile):
    env = dict(os.environ)
    overrides, flags, _ = VARIANTS[name]
    env.update(overrides)
    if flags:
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
    cmd = [sys.executable, __file__, "--variant", name, "--batch", str(batch),
           "--res", str(res), "--child"]
    if profile:
        cmd.append("--profile")
    out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                         timeout=1500, cwd=str(pathlib.Path(__file__).resolve().parents[1]))
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if out.returncode != 0 or not lines:
        return {"variant": name, "error": (out.stderr or out.stdout)[-400:]}
    return json.loads(lines[-1])


def measure(name, batch, res, profile):
    from tpugan.runtime import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from tpugan.models import Encoder, StyleGAN2Generator
    from tpugan.optim import lreq_adam
    from tpugan.ops.eq_lr import lreq_coef_tree
    from tpugan.precision import bf16_encode, bf16_frozen, bf16_pipeline
    from tpugan.losses.lpips import random_lpips_fn
    from tpugan.profiling import timeit_ms
    from tpugan.runtime import to_accelerator
    from tpugan.train import make_encode_fn, make_train_step
    from tpugan.train.e_align import SynthBatch, init_train_state

    startf = {256: 64, 512: 32, 1024: 16}[res]
    layer_count = {256: 7, 512: 8, 1024: 9}[res]
    gen = StyleGAN2Generator(resolution=res)
    enc = Encoder(startf=startf, maxf=512, layer_count=layer_count,
                  latent_size=512, use_blur=True)
    key = jax.random.PRNGKey(0)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        gvars = jax.jit(gen.init)({"params": key}, jnp.zeros((1, 512)))
        evars = jax.jit(enc.init)({"params": key, "noise": key},
                                  jnp.zeros((1, res, res, 3)))

    def synth(frozen, k, z):
        out = gen.apply(frozen, z, trunc_psi=0.7, trunc_layers=8)
        const1 = jnp.repeat(frozen["params"]["synthesis"]["const"], z.shape[0], axis=0)
        return SynthBatch(w1=out["wp"], imgs1=out["image"], const1=const1)

    def resynth(frozen, w, b, k):
        return gen.apply(frozen, w, method=gen.synthesize)["image"]

    opts = VARIANTS[name][2]
    synth, resynth = bf16_pipeline(synth, resynth)
    encode = bf16_encode(make_encode_fn(
        enc, {k_: v for k_, v in evars.items() if k_ != "params"}
    ))
    gvars = bf16_frozen(gvars)
    coefs = lreq_coef_tree(evars["params"], evars["lreq"])
    opt = lreq_adam(0.0015, coefs=coefs)
    step = make_train_step(
        encode=encode, synth=synth, resynth=resynth, optimizer=opt,
        z_dim=512, batch_size=batch, case=2,
        lpips_fn=random_lpips_fn(dtype=jnp.bfloat16),
        remat=opts.get("remat", False),
        remat_policy=opts.get("remat_policy"),
    )
    state = to_accelerator(init_train_state(evars["params"], opt))
    frozen = to_accelerator(gvars)
    if opts.get("donate"):
        # donation lets the output state alias the input buffers; lower
        # peak memory can release XLA's auto-compression. Measured via a
        # non-donating wrapper pattern: re-copy the state each call would
        # distort timing, so time the donating jit on a sacrificial copy
        # chain (state_i -> state_{i+1} is exactly training's use).
        jitted_d = jax.jit(step, donate_argnums=(0,))
        t0 = time.time()
        state = jitted_d(state, jnp.int32(0), frozen)[0]
        jax.block_until_ready(state)
        compile_s = time.time() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for i in range(8):
                state, _info = jitted_d(state, jnp.int32(i), frozen)
            jax.block_until_ready(state)
            best = min(best, (time.perf_counter() - t0) / 8)
        ms = best * 1e3
        jitted = None
    else:
        jitted = jax.jit(step)
        t0 = time.time()
        jax.block_until_ready(jitted(state, jnp.int32(0), frozen))
        compile_s = time.time() - t0
        ms = timeit_ms(lambda: jitted(state, jnp.int32(0), frozen), iters=8)
    out = {
        "variant": name,
        "batch": batch,
        "res": res,
        "ms": round(ms, 2),
        "img_s": round(batch / ms * 1e3, 2),
        "compile_s": round(compile_s, 1),
        "pallas": os.environ.get("TPUGAN_PALLAS", ""),
        "xla_flags": os.environ.get("XLA_FLAGS", ""),
    }
    if profile and jitted is not None:
        from tpugan.profiling import op_table, trace_roofline

        r = trace_roofline(lambda: jitted(state, jnp.int32(0), frozen), (), iters=3)
        out.update(
            dev_ms=round(r["seconds_per_call"] * 1e3, 2),
            hbm_gb=round(r["hbm_bytes_per_call"] / 1e9, 2),
            gbps=round(r["measured_hbm_gbps"], 1),
            mxu=round(r["mxu_utilization"], 4),
        )
        rows = op_table(r, top=2000)
        cats = {}
        for nm, cat, tf, bf, mxu in rows:
            t, b, n = cats.get(cat, (0.0, 0.0, 0))
            cats[cat] = (t + tf, b + bf, n + 1)
        print(f"--- category totals ({name}) ---")
        for cat, (t, b, n) in sorted(cats.items(), key=lambda kv: -kv[1][0]):
            print(f"{t*100:5.1f}%  bytes {b*100:5.1f}%  ops {n:4d}  {cat}")
        remat_t = sum(tf for nm, _, tf, _, _ in rows
                      if ".remat" in nm or "compressed" in nm)
        print(f"xla auto-remat/compression rows: {remat_t*100:.1f}% of step time")
        print(f"--- top ops ({name}) by time share ---")
        for nm, cat, tf, bf, mxu in rows[:30]:
            print(f"{tf*100:5.1f}%  bytes {bf*100:5.1f}%  mxu {mxu:5.3f}  [{cat}] {nm[:90]}")
    print(json.dumps(out), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="all")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--child", action="store_true")
    args = ap.parse_args()
    if args.child or args.variant != "all":
        if args.variant == "all":
            raise SystemExit("--child needs a concrete --variant")
        measure(args.variant, args.batch, args.res, args.profile)
        return
    results = []
    for name in VARIANTS:
        r = run_variant(name, args.batch, args.res, args.profile)
        results.append(r)
        print(json.dumps(r), flush=True)
    best = min((r for r in results if "ms" in r), key=lambda r: r["ms"], default=None)
    print(json.dumps({"best": best}), flush=True)


if __name__ == "__main__":
    main()
