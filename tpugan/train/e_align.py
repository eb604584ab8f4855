"""Encoder training on synthesized (z -> G -> image) pairs.

TPU-native rebuild of the reference training loops:
  * case 1 — E_align_cropping_s1.py:23-298 (aligned, image losses detached:
    the reference detaches imgs and both crops before space_loss
    (:185-201), so the image-space backward reaches no encoder parameter
    and only the ``0.01 * loss_w`` step trains E; we reproduce exactly that
    single effective update)
  * case 2 — E_align_s2.py (aligned, gradients flow through image losses;
    ``loss_tsa = imgs + 5*AT1 + 9*AT2`` then a second step on
    ``0.01 * loss_w`` — two sequential optimizer updates per iteration,
    both gradients taken at the iteration's initial parameters, matching
    the reference's two backward/step calls on one forward graph
    (E_align_s2.py:205-222))

The whole iteration — synthesis, encoding, both losses, both optimizer
updates — is one jitted function; logging info is returned as scalars so
the host syncs only at its own cadence (the reference's per-iteration
.item() calls are deliberately not replicated; SURVEY.md §5).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from tpugan.losses.space_loss import SpaceLossInfo, space_loss
from tpugan.nn.spectral import power_iterate
from tpugan.models.encoders import Encoder
from tpugan.models.stylegan1 import StyleGANv1Generator, StyleGANv1Mapping, truncation_coefs
from tpugan.utils import iteration_key


class EncoderTrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    step: jax.Array
    # live spectral-norm u/v vectors (BigGAN encoder's conditional BN);
    # refreshed by one power iteration per step like torch's in-forward
    # buffer update (nn/spectral.py::power_iterate). None for the other
    # encoders.
    sn: Any = None


class SynthBatch(NamedTuple):
    """A frozen-generator sample: latents, target images, generator const
    (BigGAN: conditional vector), optional class label."""

    w1: jax.Array
    imgs1: jax.Array
    const1: jax.Array
    label: Any = None


class StepInfo(NamedTuple):
    loss_imgs: SpaceLossInfo
    loss_medium: SpaceLossInfo
    loss_small: SpaceLossInfo
    loss_w: SpaceLossInfo
    loss_c: SpaceLossInfo
    loss_tsa: jax.Array
    loss_mtv: jax.Array


def info_scalars(info) -> dict:
    """Flatten a step-info NamedTuple into the reference's full scalar set
    (~35 tensorboard scalars per iteration, E_align_cropping_s1.py:233-279):
    every SpaceLossInfo field of every loss group, plus the totals. One
    device_get for the whole tree — no per-scalar host syncs."""
    host = jax.device_get(info)
    out: dict = {}
    for name, val in host._asdict().items():
        if hasattr(val, "_asdict"):
            for field, v in val._asdict().items():
                out[f"{name}_{field}"] = float(v)
        elif val is not None:
            out[name] = float(val)
    return out


def attention_crops(imgs: jax.Array) -> tuple[jax.Array, jax.Array]:
    """AT1/AT2 center crops for aligned data (NHWC).

    AT1 keeps full height, crops width to the middle 3/4
    (E_align_cropping_s1.py:188); AT2 crops both dims by 1/8 + 1/32 per
    side (:193-199).
    """
    h, w = imgs.shape[1], imgs.shape[2]
    at1 = imgs[:, :, w // 8 : w - w // 8, :]
    dh = h // 8 + h // 32
    dw = w // 8 + w // 32
    at2 = imgs[:, dh : h - dh, dw : w - dw, :]
    return at1, at2


def build_stylegan1_pipeline(
    gen: StyleGANv1Generator,
    gm: StyleGANv1Mapping,
    gen_vars: Any,
    gm_vars: Any,
    lod: int,
    psi: float = 0.7,
    center: Optional[jax.Array] = None,
):
    """Frozen StyleGANv1 synth/resynth closures + frozen weights (mtype 1).

    Mirrors E_align_cropping_s1.py:106-109 (w1 = Gm(z, coefs); imgs1 =
    Gs(w1, lod)) and :157-158 (imgs2 = Gs(w2, lod)).

    Returns (synth, resynth, frozen): the weights come back as an explicit
    pytree that the train step threads through jit as an *argument* —
    closure-captured weight trees are serialized into the program upload
    and overflow compile-payload limits on remote-compile backends.
    """
    coefs = truncation_coefs(gm.num_layers, psi)
    frozen = {"gen": gen_vars, "gm": gm_vars, "center": center}

    def synth(frozen, key: jax.Array, z: jax.Array) -> SynthBatch:
        w1 = gm.apply(frozen["gm"], z, coefs, frozen["center"])
        imgs1 = gen.apply(frozen["gen"], w1, lod, rngs={"noise": key})
        const1 = jnp.repeat(frozen["gen"]["params"]["const"], z.shape[0], axis=0)
        return SynthBatch(w1=w1, imgs1=imgs1, const1=const1)

    def resynth(frozen, w2: jax.Array, batch: SynthBatch, key: jax.Array) -> jax.Array:
        return gen.apply(frozen["gen"], w2, lod, rngs={"noise": key})

    return synth, resynth, frozen


def make_encode_fn(encoder, enc_extra_vars):
    """Standard encode closure: (params, batch, key) -> (const2, w2).

    Conditional encoders (E_BIG) take the condition vector as const1
    (E_align_cropping_s1.py:155)."""
    from tpugan.models.encoders import BigGANEncoder

    conditional = isinstance(encoder, BigGANEncoder)

    def encode(params, batch: SynthBatch, key, sn=None):
        variables = {**enc_extra_vars, "params": params}
        if sn is not None:
            variables = {**variables, "sn": sn}
        if conditional:
            return encoder.apply(
                variables, batch.imgs1, batch.const1, rngs={"noise": key}
            )
        return encoder.apply(variables, batch.imgs1, rngs={"noise": key})

    return encode


def make_train_step(
    encode: Callable[[Any, SynthBatch, jax.Array], tuple],
    synth: Callable[[Any, jax.Array, jax.Array], SynthBatch],
    resynth: Callable[[Any, jax.Array, "SynthBatch", jax.Array], jax.Array],
    optimizer: optax.GradientTransformation,
    z_dim: int,
    batch_size: int,
    case: int = 1,
    lpips_fn=None,
    seed_salt: int = 0,
    mesh=None,
    spatial: bool = False,
    image_weights=None,
    latent_weights=None,
    detach_image_losses=None,
    remat: bool = False,
    remat_policy: Optional[str] = None,
    sequential_image_steps: bool = False,
    compute_image_losses: bool = True,
):
    """Build the jitted per-iteration train step.

    Returns ``step(state, iteration, frozen) -> (state, StepInfo)``.
    ``iteration`` is a traced int32 scalar; the PRNG follows the reference
    seed discipline (seed = iteration % 30000). ``frozen`` carries the
    frozen generator weights as a jit argument (see
    build_stylegan1_pipeline).

    With ``mesh``, sharding constraints pin the batch to the ``data`` axis
    and (``spatial=True``) the image height to the ``space`` axis; XLA
    inserts the gradient psum and conv halo exchanges.

    The ablation ladder (ablation_utils/1..8, SURVEY.md §2.5) is exposed
    through ``image_weights=(full, at1, at2)``, ``latent_weights=(w, c)``
    (each scaled by 0.01 like the reference) and ``detach_image_losses``;
    None picks the case defaults.

    ``compute_image_losses=False`` builds the LEAN step for off-tick
    iterations: when the image-space losses are detached (case 1), they
    are log-only — the reference computes them every iteration only
    because its eager loop logs every iteration, while this CLI reads the
    scalars at its logging cadence. Skipping the resynthesis + the three
    image space_loss groups (six VGG16 LPIPS passes) between ticks leaves
    the parameter trajectory BITWISE identical (the gradient comes from
    the latent loss alone; tests/test_train.py::test_lean_step_bitwise)
    and their info fields zero. Invalid when image losses carry gradient.

    ``sequential_image_steps`` reproduces the ablation-7/8 update
    structure (7.E_align_x_AT1.py:73-86 / 8.E_align_x_AT1_AT2.py:72-116):
    ONE forward graph per iteration, then a separate
    ``backward(retain_graph=True)`` + optimizer step per loss group in
    order — imgs, wm*AT1, ws*AT2, then the latent step — every gradient
    taken at the iteration-initial parameters (the torch graph's saved
    activations are pre-update). With an adaptive optimizer this is NOT
    equivalent to one combined weighted step.
    """
    from tpugan.nn.spectral import encode_accepts_sn

    # custom encode closures (ablation z re-mapping) may not take sn
    accepts_sn = encode_accepts_sn(encode)
    if image_weights is None:
        image_weights = (1.0, 1.0, 1.0) if case == 1 else (1.0, 5.0, 9.0)
    if latent_weights is None:
        latent_weights = (1.0, 0.0)  # loss_c excluded in both scripts (:216)
    if detach_image_losses is None:
        detach_image_losses = case == 1
    if not compute_image_losses and not detach_image_losses:
        raise ValueError(
            "compute_image_losses=False requires detached (log-only) image "
            "losses; with gradients flowing through them (case 2 / ablation "
            ">=6) the lean step would change the trajectory"
        )
    if remat and remat_policy is not None:
        raise ValueError(
            "remat (full rematerialisation) and remat_policy are mutually "
            "exclusive — pass one or the other"
        )
    if remat:
        # rematerialise encoder/generator activations in the backward pass
        # (the 1024^2 pixel-gradient memory knob, SURVEY.md §5)
        encode = jax.checkpoint(encode)
        resynth = jax.checkpoint(resynth)
    elif remat_policy == "conv_outs":
        # selective policy: SAVE conv outputs (the checkpoint_name cut
        # points in EqConv/ModulatedConv), RECOMPUTE the elementwise
        # chains (blur/noise/bias/lrelu/IN) the backward would otherwise
        # re-read from HBM — byte reduction, not just memory headroom
        policy = jax.checkpoint_policies.save_only_these_names("conv_out")
        encode = jax.checkpoint(encode, policy=policy)
        resynth = jax.checkpoint(resynth, policy=policy)
    elif remat_policy is not None:
        raise ValueError(f"unknown remat_policy {remat_policy!r}")
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from tpugan.parallel.mesh import DATA_AXIS, SPACE_AXIS

        batch_sh = NamedSharding(mesh, P(DATA_AXIS))
        img_sh = NamedSharding(
            mesh, P(DATA_AXIS, SPACE_AXIS) if spatial else P(DATA_AXIS)
        )

        def constrain(z, batch):
            z = jax.lax.with_sharding_constraint(z, batch_sh)
            batch = batch._replace(
                w1=jax.lax.with_sharding_constraint(batch.w1, batch_sh),
                imgs1=jax.lax.with_sharding_constraint(batch.imgs1, img_sh),
                const1=jax.lax.with_sharding_constraint(batch.const1, batch_sh),
            )
            return z, batch
    else:
        def constrain(z, batch):
            return z, batch

    def losses(params, frozen, batch: SynthBatch, key_enc, key_resynth, sn=None):
        const2, w2 = encode(params, batch, key_enc, sn) if accepts_sn else encode(
            params, batch, key_enc
        )
        if compute_image_losses:
            imgs2 = resynth(frozen, w2, batch, key_resynth)

            if detach_image_losses:
                # reference detaches both sides of every image-space loss
                # (E_align_cropping_s1.py:185-201): log-only, no gradient
                i1 = jax.lax.stop_gradient(batch.imgs1)
                i2 = jax.lax.stop_gradient(imgs2)
            else:
                i1, i2 = batch.imgs1, imgs2

            l_imgs, i_imgs = space_loss(i1, i2, lpips_fn=lpips_fn)
            at1_1, at2_1 = attention_crops(i1)
            at1_2, at2_2 = attention_crops(i2)
            l_med, i_med = space_loss(at1_1, at1_2, lpips_fn=lpips_fn)
            l_small, i_small = space_loss(at2_1, at2_2, lpips_fn=lpips_fn)
        else:
            from tpugan.losses.space_loss import zero_space_info

            l_imgs = l_med = l_small = jnp.float32(0.0)
            i_imgs = i_med = i_small = zero_space_info()

        wi, wm, ws = image_weights
        loss_tsa = wi * l_imgs + wm * l_med + ws * l_small  # :203 / E_align_s2.py:205

        l_w, i_w = space_loss(batch.w1, w2, image_space=False)
        const1 = jax.lax.stop_gradient(batch.const1)
        if const1.shape != const2.shape:
            # PGGAN passes const1 = 0 (E_align_cropping_s1.py:75); torch
            # broadcasts the scalar in MSELoss — match by broadcasting
            const1 = jnp.broadcast_to(
                const1.reshape((const1.shape[0],) + (1,) * (const2.ndim - 1)),
                const2.shape,
            )
        l_c, i_c = space_loss(const1, const2, image_space=False)
        ww, wc = latent_weights
        loss_mtv = 0.01 * (ww * l_w + wc * l_c)

        info = StepInfo(
            loss_imgs=i_imgs, loss_medium=i_med, loss_small=i_small,
            loss_w=i_w, loss_c=i_c, loss_tsa=loss_tsa, loss_mtv=loss_mtv,
        )
        return loss_tsa, loss_mtv, info, (l_imgs, l_med, l_small)

    def step(state: EncoderTrainState, iteration, frozen) -> tuple[EncoderTrainState, StepInfo]:
        key = iteration_key(iteration, salt=seed_salt)
        kz, kg1, ke, kg2 = jax.random.split(key, 4)
        z = jax.random.normal(kz, (batch_size, z_dim), jnp.float32)
        batch = jax.lax.stop_gradient(synth(frozen, kg1, z))
        z, batch = constrain(z, batch)

        # torch updates the spectral-norm u/v on each training forward
        # (no_grad); the functional equivalent is one power iteration per
        # step against the current kernels, threaded through the state
        sn = power_iterate(state.params, state.sn)

        if case == 1:
            # image losses carry no gradient; single effective update on mtv
            def mtv_loss(p):
                _, loss_mtv, info, _ = losses(p, frozen, batch, ke, kg2, sn)
                return loss_mtv, info

            (_, info), grads = jax.value_and_grad(mtv_loss, has_aux=True)(state.params)
            updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
        elif sequential_image_steps:
            # ablation 7/8: one forward graph, one optimizer step PER loss
            # group (imgs -> wm*AT1 -> ws*AT2 -> latent), all gradients at
            # the iteration-initial params (torch backward(retain_graph)
            # reuses pre-update activations; 8.E_align_x_AT1_AT2.py:72-116)
            # per-group grad traces (not a shared vjp with one-hot
            # cotangents): each backward prunes the other groups at trace
            # time, XLA CSE shares the forward (see the case-2 branch)
            def group_loss(p, idx, wgt):
                _, loss_mtv, info, parts = losses(p, frozen, batch, ke, kg2, sn)
                groups = parts + (loss_mtv,)
                return wgt * groups[idx], info

            info = None
            params, opt_state = state.params, state.opt_state
            wi, wm, ws = image_weights
            for idx, wgt in enumerate((wi, wm, ws, 1.0)):
                if wgt == 0.0:
                    continue  # zero-weight groups take no reference step
                (_, info_i), g = jax.value_and_grad(
                    lambda p, i=idx, w=wgt: group_loss(p, i, w), has_aux=True
                )(state.params)
                info = info_i if info is None else info
                updates, opt_state = optimizer.update(g, opt_state, params)
                params = optax.apply_updates(params, updates)
        else:
            # two sequential updates, both gradients at the initial params.
            # Two separate grad traces, NOT one vjp with one-hot cotangents:
            # a zero cotangent is a runtime value, so the shared-vjp form
            # pays the full backward through the pruned branch (measured
            # +20% at SG2-1024: 241 vs 203 ms/step); separate grads prune
            # each unused branch at trace time and XLA CSE shares the
            # common forward.
            def tsa_loss(p):
                loss_tsa, _, info, _ = losses(p, frozen, batch, ke, kg2, sn)
                return loss_tsa, info

            def mtv_loss(p):
                _, loss_mtv, _, _ = losses(p, frozen, batch, ke, kg2, sn)
                return loss_mtv

            (_, info), g_tsa = jax.value_and_grad(tsa_loss, has_aux=True)(state.params)
            g_mtv = jax.grad(mtv_loss)(state.params)
            updates, opt_state = optimizer.update(g_tsa, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            updates, opt_state = optimizer.update(g_mtv, opt_state, params)
            params = optax.apply_updates(params, updates)

        return (
            state.replace(params=params, opt_state=opt_state, step=state.step + 1, sn=sn),
            info,
        )

    return step


def init_train_state(params, optimizer, sn=None) -> EncoderTrainState:
    if sn is not None:
        # private copy: train steps donate the state, and aliasing the
        # caller's sn buffers (also captured in encoder closures) would
        # leave them deleted after the first step
        sn = jax.tree.map(jnp.array, sn)
    return EncoderTrainState(
        params=params, opt_state=optimizer.init(params),
        step=jnp.zeros([], jnp.int32), sn=sn,
    )

def make_align_visuals(encode, synth, resynth, z_dim: int, batch_size: int,
                       seed_salt: int = 0):
    """Jitted reconstruction-grid tensors for the aligned CLI's on-tick
    dumps (E_align_cropping_s1.py:282-285): the torch script saves the
    imgs1/imgs2 computed DURING the iteration, i.e. at the
    iteration-INITIAL params and with the SAME single power iteration the
    train step applies before encoding (:328) — so the dumped imgs2 are
    exactly the in-iteration tensors, one compiled program per tick
    instead of an eager op-by-op replay.

    Returns ``visuals(params, sn, iteration, frozen) -> {imgs1, imgs2}``;
    jit it once in the caller (same pattern as make_mis_align_visuals).
    """
    from tpugan.nn.spectral import encode_accepts_sn

    accepts_sn = encode_accepts_sn(encode)

    def visuals(params, sn, iteration, frozen):
        key = iteration_key(iteration, salt=seed_salt)
        kz, kg1, ke, kg2 = jax.random.split(key, 4)
        z = jax.random.normal(kz, (batch_size, z_dim), jnp.float32)
        batch = jax.lax.stop_gradient(synth(frozen, kg1, z))
        sn = power_iterate(params, sn)  # match the step's pre-encode sn
        _, w2 = (
            encode(params, batch, ke, sn) if accepts_sn else encode(params, batch, ke)
        )
        imgs2 = resynth(frozen, w2, batch, kg2)
        return {"imgs1": batch.imgs1, "imgs2": imgs2}

    return visuals
