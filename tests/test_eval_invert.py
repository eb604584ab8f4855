"""Eval metrics, image IO, inversion and editing tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from tpugan.eval.metrics import pair_metrics, psnr, ssim_uniform
from tpugan.invert.edit import edit_latent
from tpugan.io.image import (
    from_unit,
    load_image,
    load_image_dir,
    save_image,
    save_image_grid,
    to_unit,
)


def test_metric_identity_fixpoint(rng):
    """comparing-baseline.py:88 anchor: identical images give psnr inf,
    ssim 1, mse 0, cosine 1."""
    a = jnp.asarray(rng.rand(64, 64, 3).astype(np.float32))
    m = pair_metrics(a, a)
    assert np.isinf(float(m.psnr)) or float(m.psnr) > 80
    np.testing.assert_allclose(float(m.ssim), 1.0, atol=1e-5)
    np.testing.assert_allclose(float(m.mse), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(m.cosine), 1.0, atol=1e-5)


def test_psnr_known_value():
    a = jnp.zeros((8, 8, 3))
    b = jnp.full((8, 8, 3), 16.0)
    # mse = 256 -> psnr = 10*log10(255^2/256) = 24.05
    np.testing.assert_allclose(float(psnr(a, b)), 10 * np.log10(255.0**2 / 256.0), rtol=1e-5)


def test_ssim_uniform_reasonable(rng):
    a = jnp.asarray(rng.rand(64, 64, 3).astype(np.float32) * 255)
    noise = jnp.asarray(rng.randn(64, 64, 3).astype(np.float32) * 5)
    s_close = float(ssim_uniform(a, a + noise))
    s_far = float(ssim_uniform(a, jnp.asarray(rng.rand(64, 64, 3).astype(np.float32) * 255)))
    assert 0.5 < s_close <= 1.0
    assert s_far < s_close


def test_image_io_roundtrip(tmp_path, rng):
    img = rng.rand(16, 16, 3).astype(np.float32)
    p = str(tmp_path / "a" / "img.png")
    save_image(p, img)
    back = load_image(p)
    np.testing.assert_allclose(back, img, atol=1.0 / 255.0 + 1e-3)
    # resize path
    back2 = load_image(p, size=8)
    assert back2.shape == (8, 8, 3)
    # dir loading
    save_image(str(tmp_path / "a" / "img2.png"), img)
    batch = load_image_dir(str(tmp_path / "a"))
    assert batch.shape == (2, 16, 16, 3)
    # grid
    save_image_grid(str(tmp_path / "grid.png"), batch, nrow=2)
    assert os.path.exists(tmp_path / "grid.png")
    # unit conversions
    np.testing.assert_allclose(from_unit(to_unit(np.zeros((2, 2, 3)) - 0.5)), -0.5)


def test_edit_latent_slice_semantics(rng):
    w = jnp.asarray(rng.randn(1, 6, 8).astype(np.float32))
    d = jnp.asarray(rng.randn(8).astype(np.float32))
    out = edit_latent(w, d, bonus=2.0, start=1, end=3)
    # layers 1..3 edited, others untouched
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(w[:, 0]))
    np.testing.assert_allclose(np.asarray(out[:, 4:]), np.asarray(w[:, 4:]))
    np.testing.assert_allclose(
        np.asarray(out[:, 1]), np.asarray(w[:, 1] + 2.0 * d[None]), rtol=1e-5
    )


def _tiny_inversion_setup(optimize_e, lpips_fn=None, mesh=None, spatial=False,
                          batch=1, iterations=20, chunk=10, lr=0.01):
    from tpugan.invert import EmbeddingConfig, make_embedder
    from tpugan.models import Encoder, StyleGANv1Generator
    from tpugan.ops.eq_lr import lreq_coef_tree

    layer_count, startf, latent = 3, 8, 32
    gen = StyleGANv1Generator(startf=startf, maxf=32, layer_count=layer_count, latent_size=latent)
    enc = Encoder(startf=startf, maxf=32, layer_count=layer_count, latent_size=latent)
    key = jax.random.PRNGKey(0)
    gen_vars = gen.init({"params": key, "noise": key}, jnp.zeros((1, 6, latent)))
    enc_vars = enc.init({"params": key, "noise": key}, jnp.zeros((1, 16, 16, 3)))
    enc_extra = {k: v for k, v in enc_vars.items() if k != "params"}
    coefs = lreq_coef_tree(enc_vars["params"], enc_vars["lreq"])

    def encode(params, imgs):
        return enc.apply({**enc_extra, "params": params}, imgs, rngs={"noise": key})

    def resynth(frozen, w):
        return gen.apply(frozen, w, rngs={"noise": key})

    cfg = EmbeddingConfig(iterations=iterations, chunk=chunk, lr=lr,
                          optimize_e=optimize_e)
    invert = make_embedder(
        encode, resynth, enc_vars["params"], coefs, cfg, frozen=gen_vars,
        lpips_fn=lpips_fn, mesh=mesh, spatial=spatial,
    )
    # expose the frozen-G closure so tests can evaluate losses of any w
    invert._resynth = lambda w: resynth(gen_vars, w)

    # target: a synthetic image from the generator itself
    w_true = jax.random.normal(jax.random.PRNGKey(5), (batch, 6, latent))
    target = gen.apply(gen_vars, w_true, rngs={"noise": key})
    return invert, target


@pytest.mark.parametrize("optimize_e", [False, True])
def test_inversion_reduces_loss(optimize_e):
    invert, target = _tiny_inversion_setup(optimize_e)
    result = invert(target)
    assert result.w.shape == (1, 6, 32)
    assert result.images.shape == target.shape
    l_first = float(result.losses[0][0])
    l_last = float(result.losses[-1][0])
    assert np.isfinite(l_first) and np.isfinite(l_last)
    assert l_last < l_first  # image loss decreased over 20 iterations


@pytest.mark.heavy
def test_inversion_lpips_cache_matches_uncached():
    """Hoisting the fixed target's LPIPS features out of the scan does not
    change the optimization trajectory: a plain-lambda lpips_fn (no
    .features attribute, so the loop recomputes the a-side per iteration)
    must give the same w as the caching closure."""
    from tpugan.losses.lpips import make_lpips_fn, random_params

    params = random_params(jax.random.PRNGKey(3), image_size=16)
    fn = make_lpips_fn(params)

    def fn_nocache(a, b):
        return fn(a, b)

    invert_c, target = _tiny_inversion_setup(False, lpips_fn=fn)
    invert_u, _ = _tiny_inversion_setup(False, lpips_fn=fn_nocache)
    r_c = invert_c(target)
    r_u = invert_u(target)
    np.testing.assert_allclose(
        np.asarray(r_c.w), np.asarray(r_u.w), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        float(r_c.losses[-1][0]), float(r_u.losses[-1][0]), rtol=1e-5
    )


@pytest.mark.heavy
def test_inversion_gradcam_attention():
    """embedding_v2_BigGAN-style inversion: grad-cam mask/overlay terms."""
    from tpugan.invert import EmbeddingConfig, make_embedder
    from tpugan.losses.vgg import VGG16
    from tpugan.models import Encoder, StyleGANv1Generator
    from tpugan.ops.eq_lr import lreq_coef_tree

    layer_count, startf, latent = 3, 8, 32
    gen = StyleGANv1Generator(startf=startf, maxf=32, layer_count=layer_count, latent_size=latent)
    enc = Encoder(startf=startf, maxf=32, layer_count=layer_count, latent_size=latent)
    key = jax.random.PRNGKey(0)
    gen_vars = gen.init({"params": key, "noise": key}, jnp.zeros((1, 6, latent)))
    enc_vars = enc.init({"params": key, "noise": key}, jnp.zeros((1, 16, 16, 3)))
    enc_extra = {k: v for k, v in enc_vars.items() if k != "params"}
    coefs = lreq_coef_tree(enc_vars["params"], enc_vars["lreq"])
    vgg = VGG16(num_classes=10)
    vgg_vars = vgg.init(jax.random.PRNGKey(7), jnp.zeros((1, 16, 16, 3)))

    def encode(params, imgs):
        return enc.apply({**enc_extra, "params": params}, imgs, rngs={"noise": key})

    def resynth(frozen, w):
        return gen.apply(frozen, w, rngs={"noise": key})

    cfg = EmbeddingConfig(iterations=10, chunk=5, lr=0.01, optimize_e=False, attention="gradcam")
    invert = make_embedder(
        encode, resynth, enc_vars["params"], coefs, cfg,
        vgg=vgg, vgg_vars=vgg_vars, frozen=gen_vars,
    )
    target = gen.apply(gen_vars, jax.random.normal(jax.random.PRNGKey(5), (1, 6, latent)), rngs={"noise": key})
    result = invert(target)
    assert np.isfinite(float(result.losses[-1][0]))
    assert float(result.losses[-1][0]) < float(result.losses[0][0])


def test_ssim_separable_matches_direct_2d(rng):
    """losses.ssim's separable two-pass blur == the reference's 2-D conv."""
    import jax.numpy as jnp_
    from tpugan.losses.ssim import _gaussian_window, ssim as ssim_sep

    def ssim_direct(img1, img2, window_size=11, sigma=1.5):
        window = jnp_.asarray(_gaussian_window(window_size, sigma))
        pad = window_size // 2
        c = img1.shape[-1]
        rhs = jnp_.tile(window[:, :, None, None], (1, 1, 1, c)).astype(img1.dtype)

        def filt(x):
            return jax.lax.conv_general_dilated(
                x, rhs, (1, 1), ((pad, pad), (pad, pad)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
            )

        mu1, mu2 = filt(img1), filt(img2)
        mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
        s1 = filt(img1 * img1) - mu1_sq
        s2 = filt(img2 * img2) - mu2_sq
        s12 = filt(img1 * img2) - mu1_mu2
        c1, c2 = 0.01**2, 0.03**2
        m = ((2 * mu1_mu2 + c1) * (2 * s12 + c2)) / (
            (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2)
        )
        return jnp_.mean(m)

    a = jnp_.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
    b = jnp_.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
    np.testing.assert_allclose(
        float(ssim_sep(a, b)), float(ssim_direct(a, b)), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(float(ssim_sep(a, a)), 1.0, atol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("optimize_e", [False, True])
@pytest.mark.heavy
def test_inversion_sharded_matches_single(optimize_e):
    """Mesh-sharded inversion (batch over ``data``, image height over
    ``space`` — SURVEY.md §2.6's 1024² pixel-gradient sharding applied to
    the inversion loop) computes the same trajectory as the unsharded
    chunk: fine-tune-E replicates E and psums the batch gradient (exactly
    the unsharded batch-mean up to fp32 reduction order), optimize-w shards
    the per-image targets.  The fine-tune-E trajectory is chaotic under
    reduction-order noise (LREQAdam's sign-like first steps), so the run is
    kept short and the loss history — not final params at tight tolerance —
    is the cross-check."""
    from tpugan.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(jax.devices()[:8], space=2)

    iters, chunk = (6, 3) if optimize_e else (20, 10)
    invert_s, target = _tiny_inversion_setup(
        optimize_e, mesh=mesh, spatial=True, batch=4, iterations=iters,
        chunk=chunk,
    )
    invert_1, _ = _tiny_inversion_setup(optimize_e, batch=4,
                                        iterations=iters, chunk=chunk)
    r_s = invert_s(target)
    r_1 = invert_1(target)
    w_tol = dict(rtol=5e-3, atol=5e-4) if optimize_e else dict(rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(r_s.w), np.asarray(r_1.w), **w_tol)
    np.testing.assert_allclose(
        np.asarray(r_s.losses), np.asarray(r_1.losses), rtol=2e-3, atol=1e-5
    )


def _msiv_of(invert, target, w):
    """The reference's loss_msiv (full image + 0.125*detached crops) for
    an arbitrary w against the fixed target batch."""
    from tpugan.losses.space_loss import space_loss
    from tpugan.train.e_align import attention_crops

    imgs2 = invert._resynth(w)
    l_imgs, _ = space_loss(target, imgs2)
    at1_1, at2_1 = attention_crops(target)
    at1_2, at2_2 = attention_crops(imgs2)
    l_med, _ = space_loss(at1_1, at1_2)
    l_small, _ = space_loss(at2_1, at2_2)
    return float(l_imgs + 0.125 * l_med + 0.125 * l_small)


def test_inversion_best_loss_snapshot():
    """embedding_v2_styleGAN1.py:127-135: the deliverable is the BEST w
    along the trajectory. With a destabilizing lr the run is non-monotone
    and the returned best-w must score <= the final w; arming happens at
    iterations//2 and the recorded loss matches the history."""
    invert, target = _tiny_inversion_setup(
        False, iterations=30, chunk=10, lr=2.0
    )
    result = invert(target)
    msiv = np.asarray(result.msiv_history)
    assert msiv.shape == (30,)
    it_b = int(result.iter_best)
    assert it_b >= 30 // 2  # armed at iterations//2, never before
    np.testing.assert_allclose(float(result.loss_best), msiv[it_b], rtol=1e-6)
    # the snapshot beats (or ties) the final w on the reference's msiv
    assert _msiv_of(invert, target, result.w_best) <= _msiv_of(
        invert, target, result.w
    ) * (1.0 + 1e-6)
    # improvement events all post-arm and consistent with the threshold
    improved = np.asarray(result.improved_history)
    assert not improved[: 30 // 2].any()


def test_inversion_best_loss_monotone_run_keeps_arm_snapshot():
    """On a smoothly converging run nothing beats the armed minimum by 5%
    immediately, but the snapshot must still exist (iter_best >= arm) and
    its loss can never exceed the armed iteration's."""
    invert, target = _tiny_inversion_setup(False, iterations=20, chunk=10)
    result = invert(target)
    msiv = np.asarray(result.msiv_history)
    assert int(result.iter_best) >= 10
    assert float(result.loss_best) <= msiv[10] * (1.0 + 1e-6)


@pytest.mark.heavy
def test_inversion_exact_iteration_count_and_cadence():
    """iterations not divisible by chunk run EXACTLY iterations steps (a
    remainder chunk, not a silent round-up to the chunk size), and the
    chunk callback fires at iteration 0 and after every chunk with w and
    its reconstruction — the reference's per-100 save cadence."""
    invert, target = _tiny_inversion_setup(False, iterations=7, chunk=5)
    calls = []

    def cb(iteration, w, imgs2):
        assert w.shape == (1, 6, 32)
        assert imgs2.shape == target.shape
        calls.append(iteration)

    result = invert(target, chunk_callback=cb)
    assert np.asarray(result.msiv_history).shape == (7,)
    assert calls == [0, 5, 7]


def test_inversion_best_loss_optimize_e():
    """Fine-tune-E mode tracks the best w too (w1 = E(imgs1) at the
    iteration-initial params)."""
    invert, target = _tiny_inversion_setup(True, iterations=10, chunk=5)
    result = invert(target)
    assert result.w_best.shape == result.w.shape
    assert int(result.iter_best) >= 5
    assert np.isfinite(float(result.loss_best))
