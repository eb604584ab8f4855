"""Component timing for the BigGAN-deep E_BIG train step.

Times (steady-state, jitted separately): generator fwd, encoder fwd,
latent grad step, full train step — with independent bf16 switches for
the generator and the encoder to isolate precision pathologies (the
bf16 512 step measured SLOWER than fp32; this pins down which side).

Usage: python scripts/prof_biggan_parts.py [--img_size 512]
       [--bf16_gen] [--bf16_enc] [--lpips]
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
    ap.add_argument("--img_size", type=int, default=512, choices=(256, 512))
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--bf16_gen", action="store_true")
    ap.add_argument("--bf16_enc", action="store_true")
    ap.add_argument("--lpips", action="store_true")
    args = ap.parse_args()

    from tpugan.models import BigGAN, BigGANConfig, BigGANEncoder
    from tpugan.optim import lreq_adam
    from tpugan.ops.eq_lr import lreq_coef_tree
    from tpugan.runtime import to_accelerator
    from tpugan.train import make_encode_fn, make_train_step
    from tpugan.train.e_align import SynthBatch, init_train_state
    from tpugan.utils import one_hot, truncated_noise_sample

    cfg = BigGANConfig.for_resolution(args.img_size, z_dim=128)
    model = BigGAN(cfg)
    startf, layer_count = {256: (64, 7), 512: (32, 8)}[args.img_size]
    enc = BigGANEncoder(
        startf=startf, maxf=512, layer_count=layer_count, cond_dim=256, z_dim=128
    )
    key = jax.random.PRNGKey(0)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        gvars = jax.jit(lambda z, l: model.init(key, z, l, 0.4))(
            jnp.zeros((1, 128)), jnp.zeros((1, 1000))
        )
        evars = jax.jit(
            lambda x, c: enc.init({"params": key, "noise": key}, x, c)
        )(jnp.zeros((1, args.img_size, args.img_size, 3)), jnp.zeros((1, 256)))

    truncation = 0.4

    def synth(frozen, k, z):
        kz, kl = jax.random.split(k)
        zt = truncated_noise_sample(kz, z.shape[0], cfg.z_dim, truncation)
        zt = zt.astype(z.dtype)  # carry the bf16 wrapper's compute dtype
        flag = jax.random.randint(kl, (), 0, cfg.num_classes)
        label = one_hot(jnp.full((z.shape[0],), flag), cfg.num_classes)
        imgs1, cond = model.apply(frozen, zt, label, truncation)
        return SynthBatch(w1=zt, imgs1=imgs1, const1=cond, label=label)

    def resynth(frozen, w2, batch, k):
        imgs2, _ = model.apply(frozen, w2, batch.label, truncation)
        return imgs2

    encode = make_encode_fn(enc, {k_: v for k_, v in evars.items() if k_ != "params"})
    from tpugan.precision import bf16_encode, bf16_frozen, bf16_pipeline

    if args.bf16_gen:
        synth, resynth = bf16_pipeline(synth, resynth)
        gvars = bf16_frozen(gvars)
    if args.bf16_enc:
        encode = bf16_encode(encode)

    frozen = to_accelerator(gvars)
    params = to_accelerator(evars["params"])
    sn0 = to_accelerator(evars.get("sn"))
    z = to_accelerator(jax.random.normal(key, (args.batch, 128)))

    synth_j = jax.jit(synth)
    batch0 = synth_j(frozen, key, z)
    print(f"synth fwd (G)        : {timeit(synth_j, frozen, key, z):8.1f} ms")

    encode_j = jax.jit(lambda p, b, s: encode(p, b, key, s))
    print(f"encode fwd (E_BIG)   : {timeit(encode_j, params, batch0, sn0):8.1f} ms")

    def resynth_fwd(frozen, params, batch0, sn):
        _, w2 = encode(params, batch0, key, sn)
        return resynth(frozen, w2, batch0, key)

    rj = jax.jit(resynth_fwd)
    print(f"encode+resynth fwd   : {timeit(rj, frozen, params, batch0, sn0):8.1f} ms")

    def lat_loss(params, batch0, sn):
        const2, w2 = encode(params, batch0, key, sn)
        return jnp.mean(jnp.square(w2 - batch0.w1)) + jnp.mean(
            jnp.square(const2 - batch0.const1)
        )

    lj = jax.jit(jax.grad(lat_loss))
    print(f"latent-loss grad     : {timeit(lj, params, batch0, sn0):8.1f} ms")

    lpips_fn = None
    if args.lpips:
        from tpugan.losses.lpips import random_lpips_fn

        lpips_fn = random_lpips_fn(
            dtype=jnp.bfloat16 if (args.bf16_gen and args.bf16_enc) else None
        )

    coefs = lreq_coef_tree(evars["params"], evars["lreq"])
    opt = lreq_adam(0.0015, coefs=coefs)
    step = make_train_step(
        encode=encode, synth=synth, resynth=resynth, optimizer=opt,
        z_dim=cfg.z_dim, batch_size=args.batch, case=1, lpips_fn=lpips_fn,
    )
    state = to_accelerator(init_train_state(evars["params"], opt, sn=evars.get("sn")))
    # NO donation here: timeit re-calls run() with the SAME state object,
    # and a donated first call would hand every later call deleted buffers
    # (prof_sg2_parts jits without donation for the same reason; bench.py
    # donates but rebinds state every call, which a shared-timeit profiler
    # can't). Donation saves ~1% — irrelevant for a part-bisection tool.
    sj = jax.jit(step)
    state, _ = sj(state, jnp.int32(0), frozen)

    def run(state):
        s, _ = sj(state, jnp.int32(1), frozen)
        return s

    print(f"full train step      : {timeit(run, state):8.1f} ms")


if __name__ == "__main__":
    main()
