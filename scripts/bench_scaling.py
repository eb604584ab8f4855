"""Batch-scaling measurement for the train steps (utilization check)."""
import json, pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from tpugan.runtime import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp

def build(batch, res=256, case=1):
    from tpugan.models import Encoder, StyleGANv1Generator, StyleGANv1Mapping
    from tpugan.optim import lreq_adam
    from tpugan.ops.eq_lr import lreq_coef_tree
    from tpugan.train import build_stylegan1_pipeline, make_train_step
    from tpugan.train.e_align import init_train_state, make_encode_fn
    lc = {128:6,256:7,512:8}[res]; sf = {128:128,256:64,512:32}[res]
    gen = StyleGANv1Generator(startf=sf, maxf=512, layer_count=lc, latent_size=512)
    gm = StyleGANv1Mapping(num_layers=2*lc, mapping_layers=8)
    enc = Encoder(startf=sf, maxf=512, layer_count=lc, latent_size=512, use_blur=case==2)
    key = jax.random.PRNGKey(0)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        gm_vars = jax.jit(gm.init)(key, jnp.zeros((1,512)))
        gen_vars = jax.jit(gen.init)({"params":key,"noise":key}, jnp.zeros((1,2*lc,512)))
        enc_vars = jax.jit(enc.init)({"params":key,"noise":key}, jnp.zeros((1,res,res,3)))
    coefs = lreq_coef_tree(enc_vars["params"], enc_vars["lreq"])
    opt = lreq_adam(0.0015, coefs=coefs)
    synth, resynth, frozen = build_stylegan1_pipeline(gen, gm, gen_vars, gm_vars, lod=lc-1)
    step = make_train_step(
        encode=make_encode_fn(enc, {k:v for k,v in enc_vars.items() if k!="params"}),
        synth=synth, resynth=resynth, optimizer=opt, z_dim=512,
        batch_size=batch, case=case)
    from tpugan.runtime import to_accelerator
    return (jax.jit(step), to_accelerator(init_train_state(enc_vars["params"], opt)),
            to_accelerator(frozen))

for case in (1, 2):
    for batch in (2, 8, 32):
        step, state, frozen = build(batch, 256, case)
        state, _ = step(state, jnp.int32(0), frozen); jax.block_until_ready(state)
        t0=time.perf_counter()
        n = 20
        for i in range(n): state, _ = step(state, jnp.int32(i), frozen)
        jax.block_until_ready(state)
        dt=(time.perf_counter()-t0)/n
        print(json.dumps({"case":case,"batch":batch,"ms_per_step":round(dt*1e3,1),
                          "images_per_sec":round(batch/dt,1)}), flush=True)
