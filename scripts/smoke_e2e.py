"""End-to-end smoke drive of the library surface on the current backend.

Synthesizes a Cat256-sized StyleGANv1 batch, encodes it, computes the
space losses and applies one LREQAdam step — everything a case-1 user of
the package touches, under jit.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
from tpugan.runtime import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp
import optax

from tpugan.models import StyleGANv1Generator, StyleGANv1Mapping, Encoder, truncation_coefs
from tpugan.losses import space_loss
from tpugan.optim import lreq_adam
from tpugan.ops.eq_lr import lreq_coef_tree
from tpugan.utils import iteration_key

t00 = time.time()
print("backend:", jax.default_backend(), jax.devices(), flush=True)

layer_count, startf = 7, 64
gen = StyleGANv1Generator(startf=startf, maxf=512, layer_count=layer_count, latent_size=512)
gm = StyleGANv1Mapping(num_layers=2 * layer_count, mapping_layers=8)
enc = Encoder(startf=startf, maxf=512, layer_count=layer_count, latent_size=512)

key = iteration_key(0)
kz, kg, ke, kn = jax.random.split(key, 4)
z = jax.random.normal(kz, (2, 512))

with jax.default_device(jax.devices("cpu")[0]):
    gm_vars = gm.init(kg, z)
    coefs = truncation_coefs(2 * layer_count)
    w_shape = jax.eval_shape(lambda: gm.apply(gm_vars, z, coefs, None))
    gen_vars = gen.init({"params": kg, "noise": kn}, jnp.zeros(w_shape.shape))
    enc_vars = enc.init(
        {"params": ke, "noise": kn}, jnp.zeros((2, 4 * 2**(layer_count - 1),) * 1 + (4 * 2**(layer_count - 1), 3))
    )
print("init done (cpu)", f"{time.time()-t00:.1f}s", flush=True)

coefs_tree = lreq_coef_tree(enc_vars["params"], enc_vars["lreq"])
opt = lreq_adam(0.0015, coefs=coefs_tree)
opt_state = opt.init(enc_vars["params"])


@jax.jit
def full_step(enc_params, opt_state, z):
    w1 = gm.apply(gm_vars, z, coefs, None)
    imgs1 = gen.apply(gen_vars, w1, rngs={"noise": kn})

    def loss_fn(params):
        const2, w2 = enc.apply({**enc_vars, "params": params}, imgs1, rngs={"noise": kn})
        imgs2 = gen.apply(gen_vars, w2, rngs={"noise": kn})
        l_imgs, info = space_loss(jax.lax.stop_gradient(imgs1), jax.lax.stop_gradient(imgs2))
        l_w, _ = space_loss(w1, w2, image_space=False)
        return 0.01 * l_w, (l_imgs, info, imgs1, imgs2)

    (loss_mtv, (l_imgs, info, imgs1_, imgs2)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(enc_params)
    updates, opt_state = opt.update(grads, opt_state, enc_params)
    params = optax.apply_updates(enc_params, updates)
    return params, opt_state, loss_mtv, l_imgs, info, imgs1_, imgs2


params = enc_vars["params"]
params2, opt_state, loss_mtv, l_imgs, info, imgs1, imgs2 = full_step(params, opt_state, z)
jax.block_until_ready(params2)
print("step 1 (compile):", f"{time.time()-t00:.1f}s", flush=True)
print("imgs1:", imgs1.shape, float(imgs1.min()), float(imgs1.max()))
print("loss_mtv:", float(loss_mtv), " loss_imgs:", float(l_imgs), " ssim_loss:", float(info.ssim))

# loss must decrease after the update (re-evaluate at new params)
_, _, loss_mtv2, *_ = full_step(params2, opt_state, z)
t1 = time.time()
_, _, loss_mtv3, *_ = full_step(params2, opt_state, z)
jax.block_until_ready(loss_mtv3)
print("steady-state step time:", f"{(time.time()-t1)*1e3:.0f}ms")
print("loss_mtv before/after update:", float(loss_mtv), "->", float(loss_mtv2))
assert float(loss_mtv2) < float(loss_mtv), "LREQAdam step did not reduce the latent loss"
print("E2E OK", f"total {time.time()-t00:.1f}s")
