"""Drive the StyleGAN2 generator end-to-end on the current backend:
z -> mapping -> truncation -> synthesis at 256, skip architecture,
plus the synthesis-only re-entry used by encoder training."""
import pathlib, sys, os, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
from tpugan.runtime import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from tpugan.models.stylegan2 import StyleGAN2Generator

t0 = time.time()
gen = StyleGAN2Generator(resolution=256)
z = jax.random.normal(jax.random.PRNGKey(1), (2, 512))
with jax.default_device(jax.local_devices(backend="cpu")[0]):
    variables = jax.jit(gen.init)({"params": jax.random.PRNGKey(0)}, z)
print("init", f"{time.time()-t0:.0f}s", flush=True)

fwd = jax.jit(lambda v, z: gen.apply(v, z, trunc_psi=0.7, trunc_layers=8))
out = fwd(variables, z)
jax.block_until_ready(out["image"])
print("image:", out["image"].shape, float(out["image"].min()), float(out["image"].max()))
print("wp:", out["wp"].shape, "styles:", sorted(k for k in out if k.startswith("style"))[:3], "...")

syn = jax.jit(lambda v, wp: gen.apply(v, wp, method=gen.synthesize))
out2 = syn(variables, out["wp"])
err = float(jnp.max(jnp.abs(out2["image"] - out["image"])))
print("synthesis-only reentry max diff:", err)
assert err < 1e-4

t1 = time.time(); out = fwd(variables, z); jax.block_until_ready(out["image"])
print(f"steady-state fwd: {(time.time()-t1)*1e3:.0f}ms")
print("SG2 SMOKE OK", f"{time.time()-t0:.0f}s")
