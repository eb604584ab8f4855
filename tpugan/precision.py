"""Mixed precision: bf16 compute for the frozen generators.

The SG2-1024 case-2 training step is HBM-bandwidth bound (round-2 roofline:
196 GB accessed/step at 268 ms = 732 GB/s ~= 89% of v5e's 819 GB/s), so
halving activation bytes is the dominant speed lever. The scheme:

  * frozen generator weights AND activations run in bfloat16;
  * moment accumulations stay fp32 inside the ops (pixel_norm /
    instance_norm / demodulation norm — see tpugan.ops.basic and
    ModulatedConv), the MXU accumulates matmuls in fp32 natively;
  * everything crossing the loss boundary is cast back to fp32, so losses,
    encoder gradients and optimizer state are untouched.

Validated by tests/test_bf16.py: reconstruction SSIM/PSNR of the bf16
pipeline within +-0.5% of the fp32 pipeline (BASELINE.md gate).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_floating(tree, dtype):
    """Cast every float leaf of a pytree to ``dtype`` (ints/bools pass)."""
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        tree,
    )


def bf16_frozen(frozen):
    """Frozen-generator weights/buffers to bf16."""
    return cast_floating(frozen, jnp.bfloat16)


def bf16_pipeline(synth, resynth):
    """Wrap (synth, resynth) closures so the generator computes in bf16.

    Inputs are cast down at the boundary, every float output cast back to
    fp32 — callers (losses, encoder, optimizer) never see bf16. Use with
    ``bf16_frozen(frozen)`` so the weights match the activation dtype.
    """

    def synth_bf16(frozen, key, z):
        batch = synth(frozen, key, z.astype(jnp.bfloat16))
        return cast_floating(batch, jnp.float32)

    def resynth_bf16(frozen, w, batch, key):
        out = resynth(frozen, w.astype(jnp.bfloat16), batch, key)
        return cast_floating(out, jnp.float32)

    return synth_bf16, resynth_bf16


def bf16_encode(encode):
    """Mixed-precision encoder compute: params and images cast to bf16
    inside the closure, outputs cast back to fp32.

    Master weights, gradients (the transpose of astype is astype back) and
    LREQAdam state all stay fp32 — only the forward/backward compute and
    its activation traffic run in bf16. Norm moments accumulate fp32
    inside the ops (tpugan.ops.basic).
    """

    from tpugan.nn.spectral import encode_accepts_sn

    inner_accepts_sn = encode_accepts_sn(encode)

    def wrapped(params, batch, key, sn=None):
        p16 = cast_floating(params, jnp.bfloat16)
        batch16 = batch._replace(
            imgs1=batch.imgs1.astype(jnp.bfloat16),
            const1=batch.const1.astype(jnp.bfloat16),
        )
        if inner_accepts_sn:
            out = encode(p16, batch16, key, sn)
        else:
            out = encode(p16, batch16, key)
        return cast_floating(out, jnp.float32)

    return wrapped


def bf16_encode_images(encode):
    """bf16 compute for an inversion-style ``encode(params, imgs[, sn])``
    taking a raw image array (invert/embedding.py), the fine-tune-E analog
    of ``bf16_encode`` (which wraps the train-step ``(params, batch, key)``
    signature): params and images cast down at the boundary, every float
    output cast back to fp32 — gradients (the transpose of astype is
    astype back) and LREQAdam state stay fp32.

    The wrapper mirrors the inner closure's ``sn`` parameter so
    ``encode_accepts_sn`` sees the same threading convention."""

    from tpugan.nn.spectral import encode_accepts_sn

    if encode_accepts_sn(encode):

        def wrapped(params, imgs, sn):
            p16 = cast_floating(params, jnp.bfloat16)
            out = encode(p16, imgs.astype(jnp.bfloat16), sn)
            return cast_floating(out, jnp.float32)

    else:

        def wrapped(params, imgs):
            p16 = cast_floating(params, jnp.bfloat16)
            out = encode(p16, imgs.astype(jnp.bfloat16))
            return cast_floating(out, jnp.float32)

    return wrapped


def bf16_lpips(lpips_fn):
    """Wrap an LPIPS closure so the VGG backbone computes in bf16.

    With the perceptual term in the measured step (six VGG16 passes per
    iteration, bench.py), the LPIPS forward/backward is a first-class
    bandwidth consumer; bf16 halves its activation bytes. Inputs cast down
    at the boundary, the per-sample distances come back fp32 (the loss
    totals and gradients stay fp32 like the rest of the bf16 scheme).

    Pass the closure built from bf16-cast params (``cast_floating(params,
    jnp.bfloat16)``) or let this wrapper rely on bf16 inputs promoting
    nothing — fp32 params with bf16 inputs would silently promote back, so
    prefer casting the params.
    """

    def fn(a, b, a_feats=None):
        d = lpips_fn(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16), a_feats=a_feats)
        return d.astype(jnp.float32)

    if hasattr(lpips_fn, "features"):
        fn.features = lambda x: lpips_fn.features(x.astype(jnp.bfloat16))
    return fn
