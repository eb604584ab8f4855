"""Real-image inversion: per-image latent optimization / encoder fine-tune.

TPU-native rebuild of embedding_img.py:24-170 and the embedding_v2_*
variants:
  * ``optimize_e=True``: fine-tune E against each image batch, reloading
    the base weights and resetting the optimizer per batch
    (embedding_img.py:82-83)
  * ``optimize_e=False``: optimize the w code directly, initialised from
    E(imgs) (:76-80)
  * two LREQAdam steps per iteration: image loss ``imgs + 0.125*(AT1+AT2)``
    with crops detached (:95-112), then ``0.01*(w + c1)`` (:117-128)
  * v2 options: w-norm regularisation ``beta * ||w||_p`` and crop weights
    0.375/0.625 (embedding_v2_styleGAN1.py:109,123)

TPU-first: the reference runs 1500 eager iterations per image with
host-side logging each step; here ``chunk`` iterations run inside one jit
via lax.scan (default 100 = the reference's logging cadence), so the host
syncs 15 times per image instead of ~10^4.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from tpugan.losses.space_loss import space_loss
from tpugan.optim import lreq_adam
from tpugan.train.e_align import attention_crops


@dataclasses.dataclass(frozen=True)
class EmbeddingConfig:
    iterations: int = 1500
    lr: float = 0.01
    beta2: float = 0.99
    optimize_e: bool = True
    chunk: int = 100
    # v2 options (embedding_v2_styleGAN1.py)
    beta: float = 0.0  # w-norm regularisation weight
    norm_p: float = 2.0
    crop_weight_medium: float = 0.125
    crop_weight_small: float = 0.125
    detach_crops: bool = True
    # embedding_v2_BigGAN.py: grad-cam mask/overlay attention terms instead
    # of center crops (loss_msiv = imgs + mask + Gcam, both detached :134-151)
    attention: str = "crops"  # crops | gradcam


class InversionResult(NamedTuple):
    w: jax.Array  # [N, L, latent] — FINAL w (last iteration)
    images: jax.Array  # [N, H, W, C] reconstructions at the final w
    losses: Any  # [iterations//chunk, ...] scalar history (chunk-final)
    # best-loss snapshot (embedding_v2_styleGAN1.py:127-135): the running
    # loss_msiv minimum, armed at iterations//2 and updated on every 5%
    # improvement (min > loss*1.05) — the v2 pipeline's deliverable is the
    # BEST w along the trajectory, not the last one
    w_best: jax.Array = None  # [N, L, latent] at the best-loss iteration
    loss_best: jax.Array = None  # scalar loss_msiv at that iteration
    iter_best: jax.Array = None  # iteration index of the snapshot
    # per-iteration records for loss_min.txt replay: (msiv, improved, wnorm)
    msiv_history: jax.Array = None  # [iterations]
    improved_history: jax.Array = None  # [iterations] bool
    wnorm_history: jax.Array = None  # [iterations]


def make_embedder(
    encode: Callable[[Any, jax.Array], tuple[jax.Array, jax.Array]],
    resynth: Callable[[Any, jax.Array], jax.Array],
    base_enc_params: Any,
    enc_coefs: Any,
    cfg: EmbeddingConfig,
    lpips_fn=None,
    vgg=None,
    vgg_vars=None,
    frozen: Any = None,
    sn0: Any = None,
    mesh=None,
    spatial: bool = False,
):
    """Build ``invert(imgs) -> InversionResult`` for one image batch.

    ``encode(params, imgs) -> (const_features, w)`` — the encoder apply;
    ``resynth(frozen, w) -> imgs`` — the frozen generator, taking its
    weight pytree as an argument;
    ``base_enc_params`` — the trained E weights (reloaded per batch);
    ``enc_coefs`` — LREQAdam coefficient pytree for E;
    ``frozen`` — the generator weight pytree, threaded through the jitted
    chunk as an *argument* (device buffers), never closure-captured: baked
    weight constants inflate the compiled program upload past remote-compile
    payload limits for the 1024² models.

    With ``mesh``, the image batch is pinned to the ``data`` axis and
    (``spatial=True``) the image height to the ``space`` axis — the
    1024² pixel-gradient sharding of SURVEY.md §2.6 applied to the
    inversion loop. In fine-tune-E mode the shared E is replicated and
    XLA inserts the gradient psum over the sharded batch (the reference's
    "run multiple command lines" scaled out, embedding_img.py:3); in
    optimize-w mode the per-image w targets shard with the batch and the
    optimization stays fully independent per device.
    """

    from tpugan.nn.spectral import encode_accepts_sn

    accepts_sn = encode_accepts_sn(encode)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from tpugan.parallel.mesh import DATA_AXIS, SPACE_AXIS

        _img_sh = NamedSharding(
            mesh, P(DATA_AXIS, SPACE_AXIS) if spatial else P(DATA_AXIS)
        )
        _vec_sh = NamedSharding(mesh, P(DATA_AXIS))

        def constrain_imgs(x):
            return jax.lax.with_sharding_constraint(x, _img_sh)

        def constrain_vec(x):
            return jax.lax.with_sharding_constraint(x, _vec_sh)
    else:
        def constrain_imgs(x):
            return x

        def constrain_vec(x):
            return x

    def apply_encode(params, imgs, sn):
        if accepts_sn:
            return encode(params, imgs, sn)
        return encode(params, imgs)

    def iteration_losses(
        opt_target, imgs1, const2_fixed, base_params, frozen_w, vgg_w, sn, cache
    ):
        cache = cache or {}
        if cfg.optimize_e:
            const2, w1 = apply_encode(opt_target, imgs1, sn)
        else:
            w1 = opt_target
            const2 = const2_fixed  # encoded once per batch (:77)
        imgs2 = resynth(frozen_w, w1)
        # the reference re-encodes imgs2 with the SAME live E being
        # fine-tuned (embedding_img.py:86-88, one module); only the
        # optimize-w mode uses the frozen base encoder
        enc_for_w2 = opt_target if cfg.optimize_e else base_params
        const3, w2 = apply_encode(enc_for_w2, imgs2, sn)

        l_imgs, i_imgs = space_loss(
            imgs1, imgs2, lpips_fn=lpips_fn, lpips_a_feats=cache.get("full")
        )
        if cfg.attention == "gradcam":
            from tpugan.losses.gradcam import grad_cam, mask2cam

            # the target-side CAM work (m1/cam1: a VGG forward+backward on
            # the fixed imgs1) is loop-invariant — precomputed per batch
            m1, cam1 = cache["m1"], cache["cam1"]
            m2 = grad_cam(vgg, vgg_w, jax.lax.stop_gradient(imgs2), plus_plus=True)
            _, cam2 = mask2cam(m2, jax.lax.stop_gradient(imgs2))
            l_med, _ = space_loss(
                jnp.tile(m1, (1, 1, 1, 3)), jnp.tile(m2, (1, 1, 1, 3)),
                lpips_fn=lpips_fn, lpips_a_feats=cache.get("m1_feats"),
            )
            l_small, _ = space_loss(
                cam1, cam2, lpips_fn=lpips_fn, lpips_a_feats=cache.get("cam1_feats")
            )
            # reference weights: imgs + mask + Gcam (embedding_v2_BigGAN.py:148)
            loss_msiv = l_imgs + l_med + l_small
        else:
            at1_1, at2_1 = attention_crops(imgs1)
            at1_2, at2_2 = attention_crops(imgs2)
            if cfg.detach_crops:
                at1_1, at1_2 = jax.lax.stop_gradient((at1_1, at1_2))
                at2_1, at2_2 = jax.lax.stop_gradient((at2_1, at2_2))
            l_med, _ = space_loss(
                at1_1, at1_2, lpips_fn=lpips_fn, lpips_a_feats=cache.get("at1")
            )
            l_small, _ = space_loss(
                at2_1, at2_2, lpips_fn=lpips_fn, lpips_a_feats=cache.get("at2")
            )
            loss_msiv = (
                l_imgs + cfg.crop_weight_medium * l_med + cfg.crop_weight_small * l_small
            )
        l_w, _ = space_loss(w1, w2, image_space=False)
        l_c1, _ = space_loss(const2, const3, image_space=False)
        loss_mslv = 0.01 * (l_w + l_c1)
        if cfg.beta > 0.0:
            wnorm = jnp.sum(jnp.abs(w1) ** cfg.norm_p) ** (1.0 / cfg.norm_p)
            loss_mslv = loss_mslv + cfg.beta * wnorm
        return loss_msiv, loss_mslv, (l_imgs, l_med, l_small, l_w, w1)

    opt = lreq_adam(cfg.lr, coefs=enc_coefs if cfg.optimize_e else None, beta2=cfg.beta2)

    can_cache_feats = lpips_fn is not None and hasattr(lpips_fn, "features")

    @jax.jit
    def precompute_cache(imgs1, vgg_w):
        """Per-batch target-side work the scan would otherwise redo every
        iteration: imgs1 and its detached crops never change, so their
        LPIPS features (3 of the 6 VGG passes/step) — and in gradcam mode
        the whole m1/cam1 CAM stack (a VGG forward+backward) — hoist out
        of the loop. Values are bitwise the in-loop computation."""
        from tpugan.losses.space_loss import pool_for_lpips

        cache = {}
        if cfg.attention == "gradcam":
            from tpugan.losses.gradcam import grad_cam, mask2cam

            m1 = grad_cam(vgg, vgg_w, imgs1, plus_plus=True)
            _, cam1 = mask2cam(m1, imgs1)
            cache["m1"], cache["cam1"] = m1, cam1
            if can_cache_feats:
                cache["m1_feats"] = lpips_fn.features(
                    pool_for_lpips(jnp.tile(m1, (1, 1, 1, 3)))
                )
                cache["cam1_feats"] = lpips_fn.features(pool_for_lpips(cam1))
        else:
            if can_cache_feats:
                at1_1, at2_1 = attention_crops(imgs1)
                cache["at1"] = lpips_fn.features(pool_for_lpips(at1_1))
                cache["at2"] = lpips_fn.features(pool_for_lpips(at2_1))
        if can_cache_feats:
            cache["full"] = lpips_fn.features(pool_for_lpips(imgs1))
        return cache

    @functools.partial(jax.jit, static_argnames=("length",))
    def run_chunk(target, opt_state, sn, best, iter0, imgs1, const2_fixed,
                  base_params, frozen_w, vgg_w, cache, length):
        from tpugan.nn.spectral import power_iterate

        imgs1 = constrain_imgs(imgs1)
        const2_fixed = constrain_vec(const2_fixed)
        if not cfg.optimize_e:
            # per-image w targets shard with the batch; in fine-tune-E mode
            # the target is the (replicated) parameter tree instead
            target = constrain_vec(target)

        def one_iteration(carry, it_global):
            target, opt_state, sn, best = carry
            if sn is not None:
                # live spectral norm, cadence matched to torch's
                # per-E-forward u/v update: optimize-E runs E(imgs1) and
                # E(imgs2) per iteration (2 advances against the
                # fine-tuned params), optimize-w runs only E(imgs2)
                # against the frozen base encoder (1 advance) —
                # embedding_v2_BigGAN.py:92-94 / :74-76
                if cfg.optimize_e:
                    sn = power_iterate(target, sn, n_iter=2)
                else:
                    sn = power_iterate(base_params, sn)

            # ONE forward graph per iteration, like the reference
            # (embedding_img.py:84-128): loss_msiv.backward(retain_graph)
            # -> step, then loss_msLv.backward() on the SAME graph -> step.
            # BOTH gradients are taken at the iteration-initial parameters
            # (the torch graph's saved activations are pre-update); only
            # the updates apply sequentially. Two separate grad traces so
            # each backward prunes the other loss branch at trace time
            # (a shared vjp with one-hot cotangents pays the full backward
            # through the zeroed branch — measured +20% at 1024^2); XLA
            # CSE shares the common forward.
            def msiv(t):
                a, b, aux = iteration_losses(
                    t, imgs1, const2_fixed, base_params, frozen_w, vgg_w, sn, cache
                )
                return a, (b, aux[4])

            def mslv(t):
                _, b, _ = iteration_losses(
                    t, imgs1, const2_fixed, base_params, frozen_w, vgg_w, sn, cache
                )
                return b

            (l_msiv, (l_mslv, w1)), g1 = jax.value_and_grad(msiv, has_aux=True)(target)
            g2 = jax.grad(mslv)(target)  # at the SAME pre-update target

            # best-loss snapshot (embedding_v2_styleGAN1.py:127-135): armed
            # exactly at iterations//2 (min := current loss), then a new
            # min requires a 5% improvement (min > loss*1.05). Both the
            # compared loss and the saved w1 are the ITERATION-INITIAL
            # values, like the torch loop (w1/loss computed before .step()).
            best_loss, best_w, best_it = best
            is_arm = it_global == cfg.iterations // 2
            best_loss = jnp.where(is_arm, l_msiv, best_loss)
            improved = (it_global > cfg.iterations // 2) & (best_loss > l_msiv * 1.05)
            take = is_arm | improved
            best_loss = jnp.where(improved, l_msiv, best_loss)
            best_w = jnp.where(take, w1, best_w)
            best_it = jnp.where(take, it_global, best_it)
            wnorm = jnp.sqrt(jnp.sum(jnp.square(w1)))  # torch w1.norm()
            best = (best_loss, best_w, best_it)

            updates, opt_state = opt.update(g1, opt_state, target)
            target = optax.apply_updates(target, updates)
            updates, opt_state = opt.update(g2, opt_state, target)
            target = optax.apply_updates(target, updates)
            return (target, opt_state, sn, best), (l_msiv, l_mslv, improved, wnorm)

        (target, opt_state, sn, best), hist = jax.lax.scan(
            one_iteration, (target, opt_state, sn, best),
            # int32 either way: under enable_x64 a bare arange is int64,
            # which would flip the best_it carry dtype mid-scan
            iter0 + jnp.arange(length, dtype=jnp.int32),
        )
        return target, opt_state, sn, best, hist

    # out-of-scan work (initial encode, per-chunk callback w/resynth,
    # final reconstruction) must be jitted too: eager op dispatch
    # round-trips the device link per op, which at 1024^2 costs seconds
    # per call (verify SKILL.md "avoid eager device code")
    encode_j = jax.jit(apply_encode)
    resynth_j = jax.jit(resynth)

    def invert(imgs1: jax.Array, chunk_callback=None) -> InversionResult:
        """``chunk_callback(iteration, w, imgs2)`` fires at iteration 0 and
        after every completed chunk (default 100 = the reference's
        per-100-iteration w/img save cadence, embedding_img.py:142-160),
        with the iteration-initial w and its reconstruction."""
        const2_fixed, w0 = encode_j(base_enc_params, imgs1, sn0)
        const2_fixed = jax.lax.stop_gradient(const2_fixed)
        if cfg.optimize_e:
            target = base_enc_params  # fresh reload per batch (:82)
        else:
            target = jax.lax.stop_gradient(w0)
        opt_state = opt.init(target)
        sn = sn0  # fresh per batch, like the reloaded E weights
        needs_cache = cfg.attention == "gradcam" or can_cache_feats
        cache = precompute_cache(imgs1, vgg_vars) if needs_cache else {}
        if chunk_callback is not None:
            chunk_callback(0, w0, resynth_j(frozen, jax.lax.stop_gradient(w0)))

        # full chunks + one remainder chunk, so the executed iteration
        # count is EXACTLY cfg.iterations (at most two compiled lengths)
        lengths = [cfg.chunk] * (cfg.iterations // cfg.chunk)
        if cfg.iterations % cfg.chunk:
            lengths.append(cfg.iterations % cfg.chunk)

        # dtype-polymorphic carry: the loss dtype follows the compute dtype
        # (f32 normally, f64 under the dryrun's enable_x64 equivalence
        # pair, where a hard float32 here would break the scan carry)
        best = (
            jnp.asarray(jnp.inf, jnp.result_type(w0.dtype, jnp.float32)),
            jnp.zeros_like(w0),
            jnp.asarray(-1, jnp.int32),
        )
        history, msiv_h, imp_h, wnorm_h = [], [], [], []
        done = 0
        for length in lengths:
            target, opt_state, sn, best, hist = run_chunk(
                target, opt_state, sn, best, jnp.int32(done), imgs1,
                const2_fixed, base_enc_params, frozen, vgg_vars, cache,
                length=length,
            )
            done += length
            history.append(jax.tree.map(lambda h: h[-1], (hist[0], hist[1])))
            msiv_h.append(hist[0])
            imp_h.append(hist[2])
            wnorm_h.append(hist[3])
            if chunk_callback is not None:
                if cfg.optimize_e:
                    _, w_c = encode_j(target, imgs1, sn)
                else:
                    w_c = target
                chunk_callback(done, w_c, resynth_j(frozen, w_c))

        if cfg.optimize_e:
            _, w_final = encode_j(target, imgs1, sn)
        else:
            w_final = target
        imgs_rec = resynth_j(frozen, w_final)
        loss_best, w_best, iter_best = best
        return InversionResult(
            w=w_final, images=imgs_rec, losses=history,
            w_best=w_best, loss_best=loss_best, iter_best=iter_best,
            msiv_history=jnp.concatenate(msiv_h),
            improved_history=jnp.concatenate(imp_h),
            wnorm_history=jnp.concatenate(wnorm_h),
        )

    return invert
