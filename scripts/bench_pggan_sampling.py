"""PGGAN Horse256 sampling throughput (BASELINE.md config 1)."""
import json, pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from tpugan.runtime import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from tpugan.models import PGGANGenerator

batch = 2  # reference synthesized_IMG config
gen = PGGANGenerator(resolution=256)
cpu = jax.local_devices(backend="cpu")[0]
with jax.default_device(cpu):
    variables = jax.jit(gen.init)(jax.random.PRNGKey(0), jnp.zeros((1, 512)))
# CPU-committed weights silently drag the jit onto the host — move them
from tpugan.runtime import to_accelerator
variables = to_accelerator(variables)

@jax.jit
def sample(variables, key):
    z = jax.random.normal(key, (batch, 512))
    return gen.apply(variables, z)["image"]

img = sample(variables, jax.random.PRNGKey(1)); jax.block_until_ready(img)
t0 = time.perf_counter()
n = 50
for i in range(n):
    img = sample(variables, jax.random.PRNGKey(i))
jax.block_until_ready(img)
dt = (time.perf_counter() - t0) / n
print(json.dumps({"metric": "pggan_horse256_sampling_images_per_sec",
                  "value": round(batch / dt, 1), "unit": "images/sec/chip",
                  "ms_per_batch": round(dt * 1e3, 2)}))
