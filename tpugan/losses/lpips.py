"""LPIPS perceptual distance (VGG flavour) — flax/NHWC.

The reference uses the external ``lpips`` pip package with net='vgg'
(E_align_cropping_s1.py:98). This is a native implementation of the same
computation: scale inputs with the published shift/scale constants,
run the VGG16 backbone, unit-normalize each feature map over channels,
square the difference, 1x1-conv linear heads, spatial mean, sum over the
five layers. Weights convert via ``tpugan.io.convert.lpips_vgg``;
``random_params`` gives an architecture-correct (untrained) fallback for
tests and smoke runs.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpugan.losses.vgg import LPIPS_FEATURES, VGG16

# published scaling-layer constants (lpips/lpips.py ScalingLayer)
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)

_LIN_CHANNELS = (64, 128, 256, 512, 512)


def _normalize_tensor(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / (norm + eps)


class LPIPS(nn.Module):
    """lpips.LPIPS(net='vgg', spatial=False) equivalent.

    __call__(a, b): NHWC images in [-1, 1] -> per-sample distance [N].
    __call__(a): feature-extraction mode — returns the five unit-normalized
    VGG feature maps of ``a``. Pass them back as ``a_feats`` to skip the
    a-side backbone pass: loops whose target image is fixed (the inversion
    scan — embedding_img.py's imgs1 and its detached crops never change
    across the 1500 iterations) hoist half the VGG passes this way; the
    distance is bitwise the computation XLA would otherwise redo per step.
    """

    @nn.compact
    def __call__(self, a: jax.Array, b: jax.Array | None = None, a_feats=None):
        backbone = VGG16(include_classifier=False, name="backbone")

        def feats(x):
            # constants in x.dtype: fp32 constants would silently promote a
            # bf16 input back to fp32 at the first op, and fp32 activations
            # x bf16 kernels promote everywhere after — the whole "bf16"
            # backbone would run fp32 (caught by the dtype assertion in
            # tests/test_cli.py::test_build_lpips_fn_bf16_wiring)
            shift = jnp.asarray(_SHIFT, x.dtype)
            scale = jnp.asarray(_SCALE, x.dtype)
            x = (x - shift) / scale
            _, fs = backbone(x)
            return [_normalize_tensor(fs[i]) for i in LPIPS_FEATURES]

        if b is None:
            return feats(a)
        fa = feats(a) if a_feats is None else a_feats
        fb = feats(b)
        total = 0.0
        for j, (xa, xb) in enumerate(zip(fa, fb)):
            diff = jnp.square(xa - xb)
            head = nn.Conv(1, (1, 1), use_bias=False, name=f"lin_{j}")
            total = total + jnp.mean(head(diff), axis=(1, 2, 3))
        return total


def random_params(key, image_size: int = 64):
    """Architecture-correct random LPIPS params (tests / no-weights runs)."""
    model = LPIPS()
    dummy = jnp.zeros((1, image_size, image_size, 3))
    return model.init(key, dummy, dummy)


def make_lpips_fn(params):
    """Closure suitable for ``space_loss(..., lpips_fn=...)``.

    The closure also carries ``fn.features(x)`` (the five normalized VGG
    maps) so callers with a loop-invariant side can precompute it and pass
    ``a_feats=`` — see LPIPS.__call__.
    """
    model = LPIPS()

    def fn(a, b, a_feats=None):
        return model.apply(params, a, b, a_feats=a_feats)

    fn.features = lambda x: model.apply(params, x)
    return fn


def random_lpips_fn(device=None, key_seed: int = 7, dtype=None):
    """Random-weight LPIPS closure for benchmarks.

    Random heads cost exactly what trained ones cost, so benches measure
    the reference's real per-iteration workload (six VGG16 passes/step:
    full image + both crops, each on target and reconstruction —
    training_utils.py:92-95, E_align_cropping_s1.py:98) without needing
    weight files. NOT for quality evaluation — see cli/common.py's loud
    random-weights warning.
    """
    import jax

    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        params = random_params(jax.random.PRNGKey(key_seed))
    if dtype is not None:
        from tpugan.precision import bf16_lpips, cast_floating

        params = cast_floating(params, dtype)
        fn = make_lpips_fn(jax.device_put(params, device or jax.devices()[0]))
        return bf16_lpips(fn)
    return make_lpips_fn(jax.device_put(params, device or jax.devices()[0]))
