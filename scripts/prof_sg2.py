import pathlib, sys, os, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
from tpugan.runtime import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from tpugan.models.stylegan2 import StyleGAN2Generator
gen = StyleGAN2Generator(resolution=256)
z = jax.random.normal(jax.random.PRNGKey(1), (2, 512))
with jax.default_device(jax.local_devices(backend="cpu")[0]):
    variables = jax.jit(gen.init)({"params": jax.random.PRNGKey(0)}, z)
fwd = jax.jit(lambda v, z: gen.apply(v, z, trunc_psi=0.7, trunc_layers=8)["image"])
img = fwd(variables, z); jax.block_until_ready(img)
for i in range(5):
    t=time.time(); img = fwd(variables, z); jax.block_until_ready(img); print(f"{(time.time()-t)*1e3:.0f}ms")
syn = jax.jit(lambda v, wp: gen.apply(v, wp, method=gen.synthesize)["image"])
wp = jnp.zeros((2,14,512))
img = syn(variables, wp); jax.block_until_ready(img)
t=time.time(); img = syn(variables, wp); jax.block_until_ready(img); print(f"syn only: {(time.time()-t)*1e3:.0f}ms")
