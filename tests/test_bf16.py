"""bf16 generator-path validation (BASELINE.md gate: reconstruction
SSIM/PSNR within +-0.5% of the fp32 pipeline)."""

import pytest

pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp
import numpy as np

from tpugan.precision import bf16_frozen, bf16_pipeline, cast_floating


def _sg2_setup(res=64):
    from tpugan.models import Encoder, StyleGAN2Generator
    from tpugan.train.e_align import SynthBatch

    gen = StyleGAN2Generator(resolution=res, fmaps_base=1024, fmaps_max=64)
    enc = Encoder(startf=16, maxf=64, layer_count=5, latent_size=512, use_blur=True)
    key = jax.random.PRNGKey(0)
    gvars = gen.init({"params": key}, jnp.zeros((1, 512)))
    evars = enc.init({"params": key, "noise": key}, jnp.zeros((1, res, res, 3)))

    def synth(frozen, k, z):
        out = gen.apply(frozen, z, trunc_psi=0.7, trunc_layers=8)
        const1 = jnp.repeat(frozen["params"]["synthesis"]["const"], z.shape[0], axis=0)
        return SynthBatch(w1=out["wp"], imgs1=out["image"], const1=const1)

    def resynth(frozen, w, b, k):
        return gen.apply(frozen, w, method=gen.synthesize)["image"]

    return synth, resynth, gvars, enc, evars


def _recon_metrics(synth, resynth, frozen, enc, evars, key):
    from tpugan.eval.metrics import psnr, ssim_uniform

    kz, ke = jax.random.split(key)
    z = jax.random.normal(kz, (2, 512))
    batch = synth(frozen, kz, z)
    _, w2 = enc.apply(evars, batch.imgs1, rngs={"noise": ke})
    imgs2 = resynth(frozen, w2, batch, ke)
    a = np.clip(np.asarray(batch.imgs1) * 0.5 + 0.5, 0, 1) * 255
    b = np.clip(np.asarray(imgs2) * 0.5 + 0.5, 0, 1) * 255
    return float(psnr(a, b)), float(ssim_uniform(a[0], b[0]))


@pytest.mark.heavy
def test_bf16_sg2_recon_parity_gate():
    """Recon PSNR/SSIM through the bf16 generator within 0.5% of fp32."""
    synth, resynth, gvars, enc, evars = _sg2_setup()
    key = jax.random.PRNGKey(42)

    psnr32, ssim32 = _recon_metrics(synth, resynth, gvars, enc, evars, key)
    s16, r16 = bf16_pipeline(synth, resynth)
    psnr16, ssim16 = _recon_metrics(s16, r16, bf16_frozen(gvars), enc, evars, key)

    assert abs(psnr16 - psnr32) / psnr32 < 0.005, (psnr16, psnr32)
    # random weights put SSIM near zero (~0.15), where the 0.5% relative
    # gate measures noise; an absolute floor of 0.002 SSIM keeps the gate
    # meaningful (trained-model SSIM ~0.9 still gets the 0.5% relative)
    assert abs(ssim16 - ssim32) < max(0.005 * ssim32, 0.002), (ssim16, ssim32)


def test_bf16_sg2_image_close():
    """The bf16 and fp32 generated images themselves stay close."""
    synth, _, gvars, _, _ = _sg2_setup()
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 512))
    imgs32 = synth(gvars, None, z).imgs1
    s16, _ = bf16_pipeline(synth, lambda *a: None)
    imgs16 = s16(bf16_frozen(gvars), None, z).imgs1
    assert imgs16.dtype == jnp.float32  # boundary cast back
    err = np.abs(np.asarray(imgs16) - np.asarray(imgs32))
    scale = np.abs(np.asarray(imgs32)).max() + 1e-6
    assert err.max() / scale < 0.05, err.max() / scale


def test_bf16_sg1_pipeline_runs():
    """StyleGANv1 synth/resynth wrapped in bf16: finite, close to fp32."""
    from tpugan.models import Encoder, StyleGANv1Generator, StyleGANv1Mapping
    from tpugan.train import build_stylegan1_pipeline

    layer_count, startf, latent = 4, 8, 64
    gen = StyleGANv1Generator(startf=startf, maxf=64, layer_count=layer_count, latent_size=latent)
    gm = StyleGANv1Mapping(
        num_layers=2 * layer_count, mapping_layers=4, latent_size=latent,
        dlatent_size=latent, mapping_fmaps=latent,
    )
    key = jax.random.PRNGKey(0)
    gm_vars = gm.init(key, jnp.zeros((1, latent)))
    gvars = gen.init({"params": key, "noise": key}, jnp.zeros((1, 2 * layer_count, latent)))
    synth, resynth, frozen = build_stylegan1_pipeline(gen, gm, gvars, gm_vars, lod=layer_count - 1)

    z = jax.random.normal(jax.random.PRNGKey(3), (2, latent))
    k = jax.random.PRNGKey(4)
    b32 = synth(frozen, k, z)
    s16, r16 = bf16_pipeline(synth, resynth)
    b16 = s16(bf16_frozen(frozen), k, z)
    assert b16.imgs1.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(b16.imgs1)))
    # same RNG draws, so the images should agree to bf16 tolerance
    err = np.abs(np.asarray(b16.imgs1) - np.asarray(b32.imgs1)).max()
    scale = np.abs(np.asarray(b32.imgs1)).max() + 1e-6
    assert err / scale < 0.08, err / scale


@pytest.mark.heavy
def test_bf16_training_trajectory_close():
    """10 case-2 train steps with the full bf16 compute path (generator +
    encoder, fp32 master weights): the loss trajectory tracks fp32."""
    from tpugan.optim import lreq_adam
    from tpugan.ops.eq_lr import lreq_coef_tree
    from tpugan.precision import bf16_encode, bf16_frozen, bf16_pipeline
    from tpugan.train import make_encode_fn, make_train_step
    from tpugan.train.e_align import init_train_state

    synth, resynth, gvars, enc, evars = _sg2_setup()
    coefs = lreq_coef_tree(evars["params"], evars["lreq"])
    opt = lreq_adam(0.0015, coefs=coefs)
    enc_extra = {k: v for k, v in evars.items() if k != "params"}

    def run(sy, re_, en, frozen):
        step = jax.jit(make_train_step(
            encode=en, synth=sy, resynth=re_, optimizer=opt,
            z_dim=512, batch_size=2, case=2,
        ))
        state = init_train_state(evars["params"], opt)
        losses = []
        for i in range(10):
            state, info = step(state, jnp.int32(i), frozen)
            losses.append(float(info.loss_tsa))
        return np.asarray(losses)

    encode = make_encode_fn(enc, enc_extra)
    l32 = run(synth, resynth, encode, gvars)
    s16, r16 = bf16_pipeline(synth, resynth)
    l16 = run(s16, r16, bf16_encode(encode), bf16_frozen(gvars))

    assert np.all(np.isfinite(l16))
    rel = np.abs(l16 - l32) / np.abs(l32)
    assert rel.max() < 0.05, (rel.max(), l16, l32)


def test_bf16_pggan_synthesis_close():
    """PGGAN sampling in bf16 stays within tolerance of fp32."""
    from tpugan.models import PGGANGenerator

    gen = PGGANGenerator(resolution=32, z_space_dim=64, fmaps_base=512, fmaps_max=64)
    key = jax.random.PRNGKey(0)
    variables = gen.init(key, jnp.zeros((1, 64)))
    z = jax.random.normal(jax.random.PRNGKey(2), (2, 64))
    img32 = gen.apply(variables, z)["image"]
    img16 = gen.apply(
        cast_floating(variables, jnp.bfloat16), z.astype(jnp.bfloat16)
    )["image"].astype(jnp.float32)
    err = np.abs(np.asarray(img16) - np.asarray(img32)).max()
    scale = np.abs(np.asarray(img32)).max() + 1e-6
    assert err / scale < 0.05, err / scale


@pytest.mark.heavy
def test_bf16_biggan_synthesis_close():
    """BigGAN-deep (cond BN truncation interpolation + SelfAttn) in bf16."""
    from tpugan.models import BigGAN, BigGANConfig

    cfg = BigGANConfig(
        output_dim=32, z_dim=16, class_embed_dim=16, channel_width=8,
        num_classes=10,
        # last out_mul must be 1 (final BN is channel_width-wide) and
        # ratios <=2 (GenBlock's channel-drop skip halves at most)
        layers=[(False, 16, 16), (True, 16, 8), (True, 8, 4), (True, 4, 2),
                (True, 2, 1)],
        attention_layer_position=2,
    )
    model = BigGAN(cfg)
    key = jax.random.PRNGKey(0)
    z = jax.random.normal(jax.random.PRNGKey(3), (2, cfg.z_dim))
    label = jax.nn.one_hot(jnp.array([1, 7]), cfg.num_classes)
    variables = model.init(key, z, label, 0.4)
    img32, cond32 = model.apply(variables, z, label, 0.4)
    img16, cond16 = model.apply(
        cast_floating(variables, jnp.bfloat16),
        z.astype(jnp.bfloat16), label.astype(jnp.bfloat16), 0.4,
    )
    err = np.abs(np.asarray(img16, dtype=np.float32) - np.asarray(img32)).max()
    # tanh output in [-1, 1]
    assert err < 0.05, err


@pytest.mark.heavy
def test_bf16_case2_train_step_close():
    """One case-2 train step with the bf16 generator: loss matches fp32
    closely and gradients stay fp32/finite."""
    from tpugan.optim import lreq_adam
    from tpugan.ops.eq_lr import lreq_coef_tree
    from tpugan.train import make_encode_fn, make_train_step
    from tpugan.train.e_align import init_train_state

    synth, resynth, gvars, enc, evars = _sg2_setup()
    coefs = lreq_coef_tree(evars["params"], evars["lreq"])
    opt = lreq_adam(0.0015, coefs=coefs)
    enc_extra = {k: v for k, v in evars.items() if k != "params"}

    def build(sy, re_, frozen):
        step = make_train_step(
            encode=make_encode_fn(enc, enc_extra), synth=sy, resynth=re_,
            optimizer=opt, z_dim=512, batch_size=2, case=2,
        )
        state = init_train_state(evars["params"], opt)
        return jax.jit(step)(state, jnp.int32(0), frozen)

    _, info32 = build(synth, resynth, gvars)
    s16, r16 = bf16_pipeline(synth, resynth)
    new_state, info16 = build(s16, r16, bf16_frozen(gvars))

    assert np.isfinite(float(info16.loss_tsa))
    rel = abs(float(info16.loss_tsa) - float(info32.loss_tsa)) / abs(float(info32.loss_tsa))
    assert rel < 0.03, (float(info16.loss_tsa), float(info32.loss_tsa))
    flat = jax.tree_util.tree_leaves(new_state.params)
    assert all(x.dtype == jnp.float32 for x in flat)


def test_bf16_lpips_tracks_fp32():
    """bf16 LPIPS (bench bf16 variants) stays within 2% relative of fp32
    on [-1,1] images — the perceptual term's precision gate."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpugan.losses.lpips import make_lpips_fn, random_params
    from tpugan.precision import bf16_lpips, cast_floating

    params = random_params(jax.random.PRNGKey(7))
    fp32 = make_lpips_fn(params)
    bf16 = bf16_lpips(make_lpips_fn(cast_floating(params, jnp.bfloat16)))
    rng = np.random.RandomState(0)
    a = jnp.asarray(np.tanh(rng.randn(2, 64, 64, 3)).astype(np.float32))
    b = jnp.asarray(np.tanh(rng.randn(2, 64, 64, 3)).astype(np.float32))
    da, db = np.asarray(fp32(a, b)), np.asarray(bf16(a, b))
    assert np.all(np.abs(da - db) / np.maximum(np.abs(da), 1e-6) < 0.02), (da, db)


def test_bf16_encode_images_close_and_sn_signature():
    """bf16_encode_images (the inversion fine-tune-E encoder lever,
    scripts/bench_inversion.py --optimizeE --bf16 / cli/embedding.py):
    outputs stay fp32 and close to the fp32 encoder, and the wrapper
    mirrors the inner closure's ``sn`` parameter so make_embedder's
    encode_accepts_sn dispatch sees the same threading convention."""
    from tpugan.models import Encoder
    from tpugan.nn.spectral import encode_accepts_sn
    from tpugan.precision import bf16_encode_images

    enc = Encoder(startf=16, maxf=64, layer_count=4, latent_size=64, use_blur=True)
    key = jax.random.PRNGKey(3)
    evars = enc.init({"params": key, "noise": key}, jnp.zeros((1, 32, 32, 3)))
    extra = {k: v for k, v in evars.items() if k != "params"}

    def encode(params, imgs):
        return enc.apply({**extra, "params": params}, imgs,
                         rngs={"noise": jax.random.PRNGKey(0)})

    imgs = jnp.tanh(jax.random.normal(jax.random.PRNGKey(5), (2, 32, 32, 3)))
    const_fp32, w_fp32 = encode(evars["params"], imgs)
    wrapped = bf16_encode_images(encode)
    assert not encode_accepts_sn(wrapped)
    const16, w16 = wrapped(evars["params"], imgs)
    assert const16.dtype == jnp.float32 and w16.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(w16), np.asarray(w_fp32), atol=0.05)
    np.testing.assert_allclose(np.asarray(const16), np.asarray(const_fp32),
                               rtol=0.1, atol=0.05)

    def encode_sn(params, imgs, sn=None):
        return encode(params, imgs)

    wrapped_sn = bf16_encode_images(encode_sn)
    assert encode_accepts_sn(wrapped_sn)
    c2, w2 = wrapped_sn(evars["params"], imgs, None)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w16), atol=1e-6)
