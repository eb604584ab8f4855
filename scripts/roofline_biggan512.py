"""Measured roofline + batch scaling for the BigGAN-512 bf16 train step.

Prints one JSON line per batch size (2/4/8) with hardware-measured HBM
bytes / device ms / MXU utilization from a jax.profiler trace — the data
behind BASELINE.md's round-4 BigGAN-512 audit (batch 8 = +135% img/s on
the same chip; batch 4 anti-recommended). Add 16 to BATCHES to reproduce
the flat-ceiling row. Workload matches the reference's E_BIG training
step (/root/reference/E_align_cropping_s1.py loop with mtype 4).
"""
import pathlib
import sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from tpugan.runtime import enable_compilation_cache
enable_compilation_cache()
import json
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
from tpugan.profiling import timeit_ms, trace_roofline

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

BATCHES = (2, 4, 8)
for batch in BATCHES:
    opt = lreq_adam(0.0015, coefs=coefs)
    step = make_train_step(encode=encode, synth=synth, resynth=resynth, optimizer=opt,
                           z_dim=cfg.z_dim, batch_size=batch, case=1, lpips_fn=lp)
    state = to_accelerator(init_train_state(evars["params"], opt, sn=evars.get("sn")))
    frozen = to_accelerator(gv16)
    j = jax.jit(step)
    ms = timeit_ms(lambda: j(state, jnp.int32(0), frozen), iters=10)
    r = trace_roofline(lambda: j(state, jnp.int32(0), frozen), (), iters=4)
    print(json.dumps({
        "batch": batch, "ms": round(ms, 2), "img_s": round(batch / ms * 1e3, 1),
        "hbm_gb": round(r["hbm_bytes_per_call"] / 1e9, 2),
        "dev_ms": round(r["seconds_per_call"] * 1e3, 2),
        "gbps": round(r["measured_hbm_gbps"], 1),
        "hbm_frac": round(r["measured_hbm_gbps"] * 1e9 / 819e9, 3),
        "mxu": round(r["mxu_utilization"], 4),
    }), flush=True)
