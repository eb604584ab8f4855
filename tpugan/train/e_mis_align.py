"""Mis-aligned encoder training with Grad-CAM++ attention supervision.

Rebuild of E_mis_align_cropping_s1.py:28-343. Instead of center crops, the
attention regions come from a pre-trained VGG16: Grad-CAM++ masks (AT1
analog) and CAM overlays (AT2 analog), with guided-backprop gradients
logged. The reference runs 4 extra VGG16 passes plus numpy/cv2 hops per
iteration (SURVEY.md §3.2 — the worst host/device churn in the codebase);
here the CAM pipeline is in-graph so the whole iteration is one jitted
step: ``loss_tsa = imgs + mask + Gcam`` (:191) then ``0.01 * loss_w``.

As in the case-1 aligned script, the reference detaches all image-space
tensors before space_loss (masks and CAMs are numpy-made, so they carry no
gradient by construction; imgs1/imgs2 are detached clones :172-194) —
reproduced with stop_gradient, so the effective update again comes from
the latent loss while the attention losses are logged.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from tpugan.losses.gradcam import grad_cam, guided_backprop, mask2cam
from tpugan.losses.space_loss import SpaceLossInfo, space_loss
from tpugan.train.e_align import EncoderTrainState, SynthBatch
from tpugan.utils import iteration_key


class MisAlignInfo(NamedTuple):
    loss_imgs: SpaceLossInfo
    loss_mask: SpaceLossInfo
    loss_gcam: SpaceLossInfo
    # guided-backprop gradient distance, LOGGED only (not in loss_tsa),
    # like the reference's loss_grad (E_mis_align_cropping_s1.py:161-172)
    loss_grad: SpaceLossInfo
    loss_w: SpaceLossInfo
    loss_c: SpaceLossInfo
    loss_tsa: jax.Array
    loss_mtv: jax.Array


from tpugan.losses.space_loss import zero_space_info as _zero_space_info


def make_mis_align_step(
    encode: Callable[[Any, SynthBatch, jax.Array], tuple],
    synth: Callable[[jax.Array, jax.Array], SynthBatch],
    resynth: Callable[[jax.Array, SynthBatch, jax.Array], jax.Array],
    optimizer: optax.GradientTransformation,
    vgg,
    z_dim: int,
    batch_size: int,
    lpips_fn=None,
    seed_salt: int = 0,
    vgg_guided=None,
    mesh=None,
    spatial: bool = False,
    cam_bf16: bool = False,
    compute_attention_losses: bool = True,
):
    """Jitted per-iteration step for the Grad-CAM training case.

    ``vgg_vars`` is an explicit step argument (not a closure capture): the
    VGG16 weights are ~550 MB as baked-in constants, which overflows
    program-upload limits — as an argument they stay device-resident.

    With ``mesh``, the batch is pinned to the ``data`` axis (and image
    height to ``space`` when ``spatial``), like make_train_step — the VGG
    forward/vjp and CAM resize all shard along the batch.

    ``cam_bf16`` runs the CAM++/guided-backprop VGG16 passes (4x VGG
    forward+backward per iteration — the step's dominant byte stream) in
    bfloat16: pass ``cast_floating(vgg_vars, jnp.bfloat16)`` as the step's
    vgg_vars and images are cast down at the attention/GBP boundary; masks
    and gb images come back fp32. The attention losses here are log-only
    (no gradient), so precision only shifts the logged scalars — gated by
    tests/test_train.py::test_mis_align_cam_bf16_close.

    ``compute_attention_losses=False`` builds the LEAN off-tick step: the
    whole attention stack here is log-only by construction (masks/CAMs
    are made from detached images, imgs1/imgs2 are detached clones,
    E_mis_align_cropping_s1.py:172-194), so skipping the resynthesis, the
    2x CAM++ and 2x guided-backprop VGG16 forward+backward passes and the
    three image space_loss groups between logging ticks leaves the
    parameter trajectory BITWISE identical (gradient = latent loss only;
    tests/test_train.py::test_lean_step_bitwise_mis_align) while their
    info fields read zero."""

    from tpugan.nn.spectral import encode_accepts_sn

    accepts_sn = encode_accepts_sn(encode)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from tpugan.parallel.mesh import DATA_AXIS, SPACE_AXIS

        batch_sh = NamedSharding(mesh, P(DATA_AXIS))
        img_sh = NamedSharding(
            mesh, P(DATA_AXIS, SPACE_AXIS) if spatial else P(DATA_AXIS)
        )

        def constrain(batch):
            return batch._replace(
                w1=jax.lax.with_sharding_constraint(batch.w1, batch_sh),
                imgs1=jax.lax.with_sharding_constraint(batch.imgs1, img_sh),
                const1=jax.lax.with_sharding_constraint(batch.const1, batch_sh),
            )
    else:
        def constrain(batch):
            return batch

    def step(state: EncoderTrainState, iteration, frozen, vgg_vars):
        def attention(images):
            if cam_bf16:
                images = images.astype(jnp.bfloat16)
            mask = grad_cam(vgg, vgg_vars, images, plus_plus=True)  # [N,H,W,1]
            _, cam = mask2cam(mask, images)
            return mask.astype(jnp.float32), cam.astype(jnp.float32)

        key = iteration_key(iteration, salt=seed_salt)
        kz, kg1, ke, kg2 = jax.random.split(key, 4)
        z = jax.random.normal(kz, (batch_size, z_dim), jnp.float32)
        batch = constrain(jax.lax.stop_gradient(synth(frozen, kg1, z)))

        from tpugan.nn.spectral import power_iterate

        sn = power_iterate(state.params, state.sn)

        def losses(params):
            const2, w2 = (
                encode(params, batch, ke, sn) if accepts_sn else encode(params, batch, ke)
            )
            if not compute_attention_losses:
                # lean off-tick step: the entire attention/image stack is
                # log-only (see docstring) — latent losses + update only
                l_w, i_w = space_loss(batch.w1, w2, image_space=False)
                l_c, i_c = space_loss(
                    jax.lax.stop_gradient(batch.const1), const2, image_space=False
                )
                loss_mtv = 0.01 * l_w
                zi = _zero_space_info()
                info = MisAlignInfo(
                    loss_imgs=zi, loss_mask=zi, loss_gcam=zi, loss_grad=zi,
                    loss_w=i_w, loss_c=i_c,
                    loss_tsa=jnp.float32(0.0), loss_mtv=loss_mtv,
                )
                return loss_mtv, info

            imgs2 = resynth(frozen, w2, batch, kg2)
            i1 = jax.lax.stop_gradient(batch.imgs1)
            i2 = jax.lax.stop_gradient(imgs2)
            mask1, cam1 = attention(i1)
            mask2, cam2 = attention(i2)

            l_imgs, i_imgs = space_loss(i1, i2, lpips_fn=lpips_fn)
            # masks are single-channel: tile to 3 for SSIM/LPIPS parity with
            # the reference's [n,1,h,w] tensors fed through space_loss
            m1 = jnp.tile(mask1, (1, 1, 1, 3))
            m2 = jnp.tile(mask2, (1, 1, 1, 3))
            l_mask, i_mask = space_loss(m1, m2, lpips_fn=lpips_fn)
            l_gcam, i_gcam = space_loss(cam1, cam2, lpips_fn=lpips_fn)
            loss_tsa = l_imgs + l_mask + l_gcam  # :191

            if vgg_guided is not None:
                # grad_i = gbp(imgs_i.detach().clone()) on each side, then
                # space_loss(grad_1, grad_2) logged every iteration
                # (E_mis_align_cropping_s1.py:163-172); by construction it
                # carries no encoder gradient — the inputs are detached
                gi1, gi2 = (
                    (i1.astype(jnp.bfloat16), i2.astype(jnp.bfloat16))
                    if cam_bf16 else (i1, i2)
                )
                gb1 = guided_backprop(vgg_guided, vgg_vars, gi1).astype(jnp.float32)
                gb2 = guided_backprop(vgg_guided, vgg_vars, gi2).astype(jnp.float32)
                _, i_grad = space_loss(gb1, gb2, lpips_fn=lpips_fn)
            else:
                i_grad = _zero_space_info()

            l_w, i_w = space_loss(batch.w1, w2, image_space=False)
            l_c, i_c = space_loss(
                jax.lax.stop_gradient(batch.const1), const2, image_space=False
            )
            loss_mtv = 0.01 * l_w
            info = MisAlignInfo(
                loss_imgs=i_imgs, loss_mask=i_mask, loss_gcam=i_gcam,
                loss_grad=i_grad,
                loss_w=i_w, loss_c=i_c, loss_tsa=loss_tsa, loss_mtv=loss_mtv,
            )
            return loss_mtv, info

        (_, info), grads = jax.value_and_grad(losses, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            state.replace(params=params, opt_state=opt_state, step=state.step + 1, sn=sn),
            info,
        )

    return step


def make_mis_align_visuals(
    encode,
    synth,
    resynth,
    vgg,
    vgg_guided,
    z_dim: int,
    batch_size: int,
    seed_salt: int = 0,
):
    """Visualisation tensors for the reference's per-100-iteration dumps
    (E_mis_align_cropping_s1.py:276-288): the imgs1/imgs2 grid plus
    heatmap / CAM-overlay / guided-backprop images, each concatenated
    (imgs1-batch then imgs2-batch) like the torch ``torch.cat`` dumps.

    Returns ``visuals(params, sn, iteration, frozen, vgg_vars) -> dict`` of
    NHWC arrays; jit it once in the caller. The guided-backprop dump keeps
    the reference's host-side normalisation (grads -= global min —
    ``np.max(np.min(grads), 0)`` is axis-0 of a scalar, not a clamp;
    grads /= max) for the CLI to apply on the host.
    """
    from tpugan.nn.spectral import encode_accepts_sn

    accepts_sn = encode_accepts_sn(encode)

    def visuals(params, sn, iteration, frozen, vgg_vars):
        from tpugan.nn.spectral import power_iterate

        key = iteration_key(iteration, salt=seed_salt)
        kz, kg1, ke, kg2 = jax.random.split(key, 4)
        z = jax.random.normal(kz, (batch_size, z_dim), jnp.float32)
        batch = jax.lax.stop_gradient(synth(frozen, kg1, z))
        # the train step encodes with power_iterate(params, sn) (:130);
        # apply the same single iteration so the dumped imgs2 are exactly
        # the in-iteration tensors, not one sn update behind
        sn = power_iterate(params, sn)
        _, w2 = (
            encode(params, batch, ke, sn) if accepts_sn else encode(params, batch, ke)
        )
        imgs2 = resynth(frozen, w2, batch, kg2)
        out = {"imgs1": batch.imgs1, "imgs2": imgs2}
        # feed the VGG stack in its own param dtype (the CLI passes bf16
        # vars under --bf16); dump tensors come back fp32 either way
        vgg_dtype = jax.tree.leaves(vgg_vars)[0].dtype
        heatmaps, cams, gbs = [], [], []
        for imgs in (batch.imgs1, imgs2):
            imgs = jax.lax.stop_gradient(imgs).astype(vgg_dtype)
            mask = grad_cam(vgg, vgg_vars, imgs, plus_plus=True)
            heatmap, cam = mask2cam(mask, imgs)
            heatmaps.append(heatmap.astype(jnp.float32))
            cams.append(cam.astype(jnp.float32))
            gbs.append(
                guided_backprop(vgg_guided, vgg_vars, imgs).astype(jnp.float32)
            )
        out["heatmap"] = jnp.concatenate(heatmaps, axis=0)
        out["cam"] = jnp.concatenate(cams, axis=0)
        out["gb"] = jnp.concatenate(gbs, axis=0)
        return out

    return visuals
