"""Component timing for the SG2-1024 case-2 step: where do 200 ms go?

Times (steady-state, jitted separately): generator fwd, encoder fwd,
image-space grad step, latent grad step, full train step — fp32 and bf16.
Usage: python scripts/prof_sg2_parts.py [--res 1024] [--batch 2] [--bf16]
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from tpugan.runtime import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp


from tpugan.profiling import timeit_ms as timeit  # shared best-of-3 methodology


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--lpips", action="store_true",
                    help="include the LPIPS/VGG term in the losses (the "
                         "reference's real per-iteration workload)")
    ap.add_argument("--remat_policy", default=None, choices=("conv_outs",))
    args = ap.parse_args()

    from tpugan.models import Encoder, StyleGAN2Generator
    from tpugan.optim import lreq_adam
    from tpugan.ops.eq_lr import lreq_coef_tree
    from tpugan.precision import bf16_encode, bf16_frozen, bf16_pipeline
    from tpugan.runtime import to_accelerator
    from tpugan.train import make_encode_fn, make_train_step
    from tpugan.train.e_align import SynthBatch, init_train_state

    res, batch = args.res, args.batch
    startf = {128: 128, 256: 64, 512: 32, 1024: 16}[res]
    layer_count = {128: 6, 256: 7, 512: 8, 1024: 9}[res]
    gen = StyleGAN2Generator(resolution=res)
    enc = Encoder(startf=startf, maxf=512, layer_count=layer_count, latent_size=512, use_blur=True)
    key = jax.random.PRNGKey(0)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        gvars = jax.jit(gen.init)({"params": key}, jnp.zeros((1, 512)))
        evars = jax.jit(enc.init)({"params": key, "noise": key}, jnp.zeros((1, res, res, 3)))
    coefs = lreq_coef_tree(evars["params"], evars["lreq"])
    opt = lreq_adam(0.0015, coefs=coefs)

    def synth(frozen, k, z):
        out = gen.apply(frozen, z, trunc_psi=0.7, trunc_layers=8)
        const1 = jnp.repeat(frozen["params"]["synthesis"]["const"], z.shape[0], axis=0)
        return SynthBatch(w1=out["wp"], imgs1=out["image"], const1=const1)

    def resynth(frozen, w, b, k):
        return gen.apply(frozen, w, method=gen.synthesize)["image"]

    encode = make_encode_fn(enc, {k_: v for k_, v in evars.items() if k_ != "params"})
    if args.bf16:
        synth, resynth = bf16_pipeline(synth, resynth)
        encode = bf16_encode(encode)
        gvars = bf16_frozen(gvars)

    frozen = to_accelerator(gvars)
    params = to_accelerator(evars["params"])
    z = to_accelerator(jax.random.normal(key, (batch, 512)))

    synth_j = jax.jit(synth)
    batch0 = synth_j(frozen, key, z)
    print(f"synth fwd          : {timeit(synth_j, frozen, key, z):8.1f} ms")

    encode_j = jax.jit(encode)
    print(f"encode fwd         : {timeit(encode_j, params, batch0, key):8.1f} ms")

    def resynth_fwd(frozen, params, batch0):
        _, w2 = encode(params, batch0, key)
        return resynth(frozen, w2, batch0, key)

    rj = jax.jit(resynth_fwd)
    print(f"encode+resynth fwd : {timeit(rj, frozen, params, batch0):8.1f} ms")

    lpips_fn = None
    if args.lpips:
        from tpugan.losses.lpips import make_lpips_fn, random_params

        with jax.default_device(cpu):
            lp = random_params(jax.random.PRNGKey(7))
        lpips_fn = make_lpips_fn(to_accelerator(lp))

    # image-space grad (case-2 first optimizer step's backward) — the real
    # space_loss (incl. crops + LPIPS when --lpips), like the train step
    from tpugan.losses.space_loss import space_loss
    from tpugan.train.e_align import attention_crops

    def img_loss(params, frozen, batch0):
        _, w2 = encode(params, batch0, key)
        imgs2 = resynth(frozen, w2, batch0, key)
        l, _ = space_loss(batch0.imgs1, imgs2, lpips_fn=lpips_fn)
        a1, a2 = attention_crops(batch0.imgs1)
        b1, b2 = attention_crops(imgs2)
        lm, _ = space_loss(a1, b1, lpips_fn=lpips_fn)
        ls, _ = space_loss(a2, b2, lpips_fn=lpips_fn)
        return l + 5.0 * lm + 9.0 * ls

    gj = jax.jit(jax.grad(img_loss))
    print(f"image-loss grad    : {timeit(gj, params, frozen, batch0):8.1f} ms")

    # latent grad (second optimizer step: losses on w/const only)
    def lat_loss(params, batch0):
        const2, w2 = encode(params, batch0, key)
        return jnp.mean(jnp.square(w2 - batch0.w1)) + jnp.mean(jnp.square(const2 - batch0.const1))

    lj = jax.jit(jax.grad(lat_loss))
    print(f"latent-loss grad   : {timeit(lj, params, batch0):8.1f} ms")

    step = make_train_step(
        encode=encode, synth=synth, resynth=resynth, optimizer=opt,
        z_dim=512, batch_size=batch, case=2, lpips_fn=lpips_fn,
        remat_policy=args.remat_policy,
    )
    state = to_accelerator(init_train_state(evars["params"], opt))
    sj = jax.jit(step)
    state, _ = sj(state, jnp.int32(0), frozen)

    def run(state):
        s, _ = sj(state, jnp.int32(1), frozen)
        return s

    print(f"full train step    : {timeit(run, state):8.1f} ms")


if __name__ == "__main__":
    main()
