"""Top-op breakdown of the BigGAN-512 bf16 train step at a given batch.

Traces the full step (and optionally just the synth forward) and dumps the
top ops by device time from xprof's op_profile, with hardware-measured
bytes accessed — the tool behind BASELINE.md's round-4 BigGAN-512 audit
(flat movement-bound profile; the batch-4 layout pathology). The hot path
profiled here is the reference's E_BIG encoder + biggan-deep generator
(/root/reference/model/E/E_BIG.py:30-235, model/biggan_generator.py).

Usage: python scripts/prof_biggan512_ops.py [--batch 4] [--what step|synth]
"""
import pathlib
import sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from tpugan.runtime import enable_compilation_cache
enable_compilation_cache()
import argparse
import glob
import json
import tempfile

import jax, jax.numpy as jnp
from tpugan.models import BigGAN, BigGANConfig, BigGANEncoder
from tpugan.optim import lreq_adam
from tpugan.ops.eq_lr import lreq_coef_tree
from tpugan.runtime import to_accelerator
from tpugan.train import make_encode_fn, make_train_step
from tpugan.train.e_align import SynthBatch, init_train_state
from tpugan.utils import one_hot, truncated_noise_sample
from tpugan.precision import bf16_encode, bf16_frozen, bf16_pipeline
from tpugan.losses.lpips import random_lpips_fn

ap = argparse.ArgumentParser()
ap.add_argument("--batch", type=int, default=4)
ap.add_argument("--what", choices=("step", "synth"), default="step")
ap.add_argument("--top", type=int, default=18)
args = ap.parse_args()

IMG = 512
cfg = BigGANConfig.for_resolution(IMG, z_dim=128)
model = BigGAN(cfg)
enc = BigGANEncoder(startf=32, maxf=512, layer_count=8, cond_dim=256, z_dim=128)
key = jax.random.PRNGKey(0)
cpu = jax.local_devices(backend="cpu")[0]
with jax.default_device(cpu):
    gvars = jax.jit(lambda z, l: model.init(key, z, l, 0.4))(jnp.zeros((1, 128)), jnp.zeros((1, 1000)))
    evars = jax.jit(lambda x, c: enc.init({"params": key, "noise": key}, x, c))(
        jnp.zeros((1, IMG, IMG, 3)), jnp.zeros((1, 256)))
truncation = 0.4

def synth(frozen, k, z):
    kz, kl = jax.random.split(k)
    zt = truncated_noise_sample(kz, z.shape[0], cfg.z_dim, truncation).astype(z.dtype)
    flag = jax.random.randint(kl, (), 0, cfg.num_classes)
    label = one_hot(jnp.full((z.shape[0],), flag), cfg.num_classes)
    imgs1, cond = model.apply(frozen, zt, label, truncation)
    return SynthBatch(w1=zt, imgs1=imgs1, const1=cond, label=label)

def resynth(frozen, w2, batch, k):
    return model.apply(frozen, w2, batch.label, truncation)[0]

encode = make_encode_fn(enc, {k_: v for k_, v in evars.items() if k_ != "params"})
synth, resynth = bf16_pipeline(synth, resynth)
gv16 = bf16_frozen(gvars)
encode = bf16_encode(encode)
lp = random_lpips_fn(dtype=jnp.bfloat16)
coefs = lreq_coef_tree(evars["params"], evars["lreq"])

batch = args.batch
opt = lreq_adam(0.0015, coefs=coefs)
step = make_train_step(encode=encode, synth=synth, resynth=resynth, optimizer=opt,
                       z_dim=cfg.z_dim, batch_size=batch, case=1, lpips_fn=lp)
state = to_accelerator(init_train_state(evars["params"], opt, sn=evars.get("sn")))
frozen = to_accelerator(gv16)

if args.what == "step":
    j = jax.jit(step)
    def run():
        return j(state, jnp.int32(0), frozen)
else:
    j = jax.jit(synth)
    z = to_accelerator(jax.random.normal(key, (batch, 128)))
    def run():
        return j(frozen, key, z)

out = run(); jax.block_until_ready(out)
logdir = tempfile.mkdtemp(prefix=f"bg512_ops_b{batch}_")
with jax.profiler.trace(logdir):
    for _ in range(4):
        out = run()
    jax.block_until_ready(out)
paths = sorted(glob.glob(logdir + "/**/*.xplane.pb", recursive=True))
from xprof.convert import raw_to_tool_data as _r
data, _ = _r.xspace_to_tool_data(paths, "op_profile", {})
prof = json.loads(data if isinstance(data, str) else data.decode())
cats = prof.get("byCategory", {}).get("children") or []
for c in sorted(cats, key=lambda c: -c["metrics"].get("normalizedTimePs", 0))[:14]:
    m = c["metrics"]
    print(f'CAT {m.get("normalizedTimePs",0)/1e9/4:8.2f} ms  {float(m.get("rawBytesAccessedArray",[0])[0] or 0)/4/1e9:7.3f} GB  {c["name"]}')
programs = prof.get("byProgram", {}).get("children") or []
best = max(programs, key=lambda c: c["metrics"].get("rawTime", 0))
total_ps = best["metrics"]["normalizedTimePs"]
total_bytes = float(best["metrics"]["rawBytesAccessedArray"][0])
print(f"batch={batch} what={args.what} total_device_ms={total_ps/1e9/4:.2f} "
      f"hbm_gb_per_call={total_bytes/4/1e9:.2f}")

ops = []
def walk(node, depth=0):
    ch = node.get("children") or []
    if not ch:
        m = node.get("metrics", {})
        ops.append((m.get("normalizedTimePs", 0), float(m.get("rawBytesAccessedArray", [0])[0] or 0),
                    m.get("flops", 0.0), node.get("name", "?")))
    for c in ch:
        walk(c, depth + 1)
walk(best)
ops.sort(reverse=True)
print(f"{'ms/call':>8} {'GB/call':>8} {'mxu%':>6}  op")
for t, b, f, n in ops[:args.top]:
    print(f"{t/1e9/4:8.2f} {b/4/1e9:8.3f} {100*f:6.1f}  {n[:110]}")
