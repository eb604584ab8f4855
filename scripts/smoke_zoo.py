"""Drive PGGAN + BigGAN generators and their encoders on the current
backend — the mtype-3/mtype-4 synthesis->encode paths a user runs."""
import pathlib, sys, os, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
from tpugan.runtime import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from tpugan.models import (BigGAN, BigGANConfig, BigGANEncoder, PGEncoder, PGGANGenerator)
from tpugan.utils import one_hot, truncated_noise_sample

t0 = time.time()
cpu = jax.local_devices(backend="cpu")[0]

# --- PGGAN Horse256-class: synthesis + E_PG encode (mtype 3)
gen = PGGANGenerator(resolution=256)
z = jax.random.normal(jax.random.PRNGKey(0), (2, 512))
with jax.default_device(cpu):
    gv = jax.jit(gen.init)(jax.random.PRNGKey(0), z)
img = jax.jit(lambda v, z: gen.apply(v, z)["image"])(gv, z)
jax.block_until_ready(img)
print("pggan image:", img.shape, float(img.min()), float(img.max()), f"{time.time()-t0:.0f}s", flush=True)

enc = PGEncoder(startf=64, maxf=512, layer_count=7)
with jax.default_device(cpu):
    ev = jax.jit(enc.init)({"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)}, img)
feats, z2 = jax.jit(lambda v, x: enc.apply(v, x, rngs={"noise": jax.random.PRNGKey(3)}))(ev, img)
print("E_PG:", feats.shape, z2.shape, flush=True)
img2 = jax.jit(lambda v, z: gen.apply(v, z)["image"])(gv, z2)
print("pggan re-synth from E_PG z:", img2.shape, flush=True)

# --- BigGAN-deep 128-config (smaller for smoke): cond synth + E_BIG encode (mtype 4)
cfg = BigGANConfig()  # 128 config
model = BigGAN(cfg)
key = jax.random.PRNGKey(4)
zt = truncated_noise_sample(key, batch_size=2, dim_z=cfg.z_dim, truncation=0.4)
label = one_hot(jnp.asarray([207, 8]), cfg.num_classes)
with jax.default_device(cpu):
    bv = jax.jit(lambda z, l: model.init(jax.random.PRNGKey(5), z, l, 0.4))(zt, label)
image, cond = jax.jit(lambda v, z, l: model.apply(v, z, l, 0.4))(bv, zt, label)
jax.block_until_ready(image)
print("biggan image:", image.shape, "cond:", cond.shape, float(image.min()), float(image.max()), flush=True)

benc = BigGANEncoder(startf=128, maxf=512, layer_count=6)
with jax.default_device(cpu):
    bev = jax.jit(lambda x, c: benc.init({"params": jax.random.PRNGKey(6), "noise": jax.random.PRNGKey(7)}, x, c))(image, cond)
(c_v, z_rec), sn_upd = jax.jit(
    lambda v, x, c: benc.apply(v, x, c, rngs={"noise": jax.random.PRNGKey(8)}, mutable=["sn"])
)(bev, image, cond)
print("E_BIG: cond", c_v.shape, "z", z_rec.shape, "sn-updated:", len(jax.tree.leaves(sn_upd)), flush=True)
img_rec, _ = jax.jit(lambda v, z, l: model.apply(v, z, l, 0.4))(bv, z_rec, label)
print("biggan re-synth from E_BIG z:", img_rec.shape, flush=True)
print("ZOO SMOKE OK", f"{time.time()-t0:.0f}s")
