"""jax.export serving artifacts (io/export.py): roundtrip fidelity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpugan.io.export import (
    export_jit, load_exported, load_exported_file, save_exported,
)


@pytest.mark.slow
def test_export_synthesis_roundtrip(tmp_path):
    """A frozen StyleGANv1 synthesis closure exports and reloads with
    identical outputs (weights baked in as constants)."""
    from tpugan.models import StyleGANv1Generator

    gen = StyleGANv1Generator(startf=8, maxf=32, layer_count=3, latent_size=32)
    key = jax.random.PRNGKey(0)
    w0 = jnp.zeros((2, 6, 32))
    gvars = gen.init({"params": key, "noise": key}, w0)

    def synth(w):
        return gen.apply(gvars, w, 2, rngs={"noise": jax.random.PRNGKey(1)})

    w = jax.random.normal(jax.random.PRNGKey(3), (2, 6, 32))
    blob = export_jit(synth, w)
    assert isinstance(blob, bytes) and len(blob) > 0
    f = load_exported(blob)
    # the artifact reproduces the JITTED function bitwise (eager apply
    # differs by fusion rounding ~1e-5, which is jit-vs-eager, not export)
    ref = np.asarray(jax.jit(synth)(w))
    np.testing.assert_array_equal(np.asarray(f(w)), ref)

    path = str(tmp_path / "synth.stablehlo")
    save_exported(path, synth, w)
    g = load_exported_file(path)
    np.testing.assert_array_equal(np.asarray(g(w)), ref)


@pytest.mark.slow
def test_export_encoder_roundtrip():
    """The encoder forward (tuple outputs) survives export."""
    from tpugan.models import Encoder

    enc = Encoder(startf=8, maxf=32, layer_count=3, latent_size=32)
    key = jax.random.PRNGKey(0)
    evars = enc.init({"params": key, "noise": key}, jnp.zeros((1, 16, 16, 3)))

    def encode(imgs):
        return enc.apply(evars, imgs, rngs={"noise": jax.random.PRNGKey(0)})

    imgs = jnp.tanh(jax.random.normal(jax.random.PRNGKey(5), (2, 16, 16, 3)))
    f = load_exported(export_jit(encode, imgs))
    c_ref, w_ref = jax.jit(encode)(imgs)
    c, w = f(imgs)
    np.testing.assert_array_equal(np.asarray(c), np.asarray(c_ref))
    np.testing.assert_array_equal(np.asarray(w), np.asarray(w_ref))


def test_export_shape_check():
    """Artifacts are shape-specialized: calling with a different batch
    raises rather than silently recompiling."""
    f = load_exported(export_jit(lambda x: x * 2.0, jnp.zeros((2, 4))))
    with pytest.raises(Exception):
        f(jnp.zeros((3, 4)))
