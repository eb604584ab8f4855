"""Shared CLI plumbing: reference-compatible flags + model factory.

Flag names and semantics follow the reference scripts exactly
(E_align_cropping_s1.py:302-316): ``--mtype {1: StyleGANv1, 2: StyleGANv2,
3: PGGAN, 4: BigGAN}``, ``--start_features {16->1024, 32->512, 64->256,
128->128}``, ``--z_dim`` (512; BigGAN 128), ``--checkpoint_dir_GAN``
pointing at the torch checkpoints (converted on the fly) — plus
TPU-native extras (``--random_init`` for weight-free smoke runs,
``--space_shards`` for spatial sharding, ``--bf16``).
"""

from __future__ import annotations

import argparse
import math
import os
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

from tpugan.runtime import enable_compilation_cache

enable_compilation_cache()


def add_common_args(parser: argparse.ArgumentParser, training: bool = True):
    if training:
        parser.add_argument("--iterations", type=int, default=210000)
        parser.add_argument("--lr", type=float, default=0.0015)
        parser.add_argument("--beta_1", type=float, default=0.0)
        parser.add_argument("--batch_size", type=int, default=2)
    parser.add_argument("--experiment_dir", default=None)
    parser.add_argument("--checkpoint_dir_GAN", default=None)
    parser.add_argument("--config_dir", default=None)  # BigGAN config JSON
    parser.add_argument("--checkpoint_dir_E", default=None)
    parser.add_argument("--img_size", type=int, default=1024)
    parser.add_argument("--img_channels", type=int, default=3)
    parser.add_argument("--z_dim", type=int, default=512)
    parser.add_argument("--mtype", type=int, default=2)
    parser.add_argument("--start_features", type=int, default=16)
    # TPU-native extras
    parser.add_argument("--random_init", action="store_true",
                        help="random weights instead of converted checkpoints")
    parser.add_argument("--ablation", type=int, default=0, choices=range(0, 9),
                        help="ablation ladder step (ablation_utils/1..8); 0 = off")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--space_shards", type=int, default=1)
    parser.add_argument("--lpips_weights", default=None,
                        help="official lpips (vgg) state dict; random heads if absent")
    parser.add_argument("--vgg_weights", default=None,
                        help="torchvision vgg16 state dict (grad-cam path)")
    parser.add_argument("--multihost", action="store_true",
                        help="initialise jax.distributed so the mesh spans "
                             "all hosts of a TPU pod (DCN across slices); "
                             "harmless no-op on a single host — see "
                             "runtime.init_distributed")
    return parser


class GanBundle(NamedTuple):
    """Frozen generator closures + encoder for one mtype.

    ``synth(frozen, key, z)`` / ``resynth(frozen, w, batch, key)`` take the
    frozen weight pytree explicitly so jitted steps receive it as an
    argument (closure-captured weights overflow remote-compile payloads)."""

    synth: Any  # (frozen, key, z) -> SynthBatch
    resynth: Any  # (frozen, w, batch, key) -> images
    encoder: Any  # flax module
    enc_vars: Any
    z_dim: int
    layer_count: int
    num_style_layers: int
    frozen: Any = None  # frozen generator weight pytree
    remap: Any = None  # (frozen, z) -> w+ (mtype 1; ablation-1 re-mapping)


def _encoder_variant_kwargs(ablation: int, case: int) -> dict:
    """Ablation-ladder encoder variants (model/E/Ablation_Study/*):
    1 -> E_Blur_Z (z head only), 2 -> E_Blur_W_2 (single w, no noise),
    3 -> E_Blur_W (no noise), 4+ -> E_Blur."""
    if ablation == 1:
        return dict(use_blur=True, style_mode="none", z_head=True)
    if ablation == 2:
        return dict(use_blur=True, style_mode="single", use_noise=False)
    if ablation == 3:
        return dict(use_blur=True, use_noise=False)
    if ablation >= 4:
        return dict(use_blur=True)
    return dict(use_blur=case == 2)


def _layer_count(img_size: int) -> int:
    return int(math.log2(img_size)) - 1


def build_bundle(args) -> GanBundle:
    """Construct the frozen G (+ mapping) and trainable E for args.mtype."""
    if getattr(args, "multihost", False):
        # must run before the first device query so jax.devices() is the
        # global pod view when auto_mesh sizes the data axis
        from tpugan.runtime import init_distributed

        init_distributed()
    mtype = args.mtype
    layer_count = _layer_count(args.img_size)
    key = jax.random.PRNGKey(args.seed)
    cpu = jax.local_devices(backend="cpu")[0]

    if mtype == 1:
        from tpugan.io import convert
        from tpugan.models import Encoder, StyleGANv1Generator, StyleGANv1Mapping
        from tpugan.train.e_align import build_stylegan1_pipeline

        gen = StyleGANv1Generator(
            startf=args.start_features, maxf=512, layer_count=layer_count, latent_size=512
        )
        gm = StyleGANv1Mapping(num_layers=2 * layer_count, mapping_layers=8)
        with jax.default_device(cpu):
            z0 = jnp.zeros((1, 512))
            gm_vars = jax.jit(gm.init)(key, z0)
            w0 = jnp.zeros((1, 2 * layer_count, 512))
            gen_vars = jax.jit(gen.init)({"params": key, "noise": key}, w0)
        center = None
        if not args.random_init:
            path = args.checkpoint_dir_GAN
            gs_state = convert.load_torch_state_dict(os.path.join(path, "Gs_dict.pth"))
            gm_state = convert.load_torch_state_dict(os.path.join(path, "Gm_dict.pth"))
            gen_vars = {"params": jax.tree.map(jnp.asarray, convert.stylegan1_generator(gs_state, layer_count))}
            gm_vars = {"params": jax.tree.map(jnp.asarray, convert.stylegan1_mapping(gm_state))}
            center = jnp.asarray(convert.center_tensor(os.path.join(path, "center_tensor.pt")))
        synth, resynth, frozen = build_stylegan1_pipeline(
            gen, gm, gen_vars, gm_vars, lod=layer_count - 1, center=center
        )
        enc = Encoder(
            startf=args.start_features, maxf=512, layer_count=layer_count, latent_size=512,
            **_encoder_variant_kwargs(getattr(args, "ablation", 0), getattr(args, "case", 1)),
        )
        with jax.default_device(cpu):
            img0 = jnp.zeros((1, args.img_size, args.img_size, 3))
            enc_vars = jax.jit(enc.init)({"params": key, "noise": key}, img0)
        if args.checkpoint_dir_E:
            from tpugan.io import convert as cv

            e_state = cv.load_torch_state_dict(args.checkpoint_dir_E)
            enc_vars = {**enc_vars, "params": jax.tree.map(jnp.asarray, cv.encoder(e_state, layer_count))}
        from tpugan.models.stylegan1 import truncation_coefs

        coefs = truncation_coefs(2 * layer_count)
        remap = lambda frozen, z: gm.apply(frozen["gm"], z, coefs, frozen["center"])
        return GanBundle(
            synth, resynth, enc, enc_vars, 512, layer_count, 2 * layer_count,
            frozen, remap,
        )

    if mtype == 2:
        from tpugan.io import convert
        from tpugan.models import Encoder, StyleGAN2Generator
        from tpugan.train.e_align import SynthBatch

        gen = StyleGAN2Generator(resolution=args.img_size)
        with jax.default_device(cpu):
            z0 = jnp.zeros((1, 512))
            variables = jax.jit(gen.init)({"params": key}, z0)
        if not args.random_init:
            state = convert.load_torch_state_dict(args.checkpoint_dir_GAN)
            if "generator_smooth" in state and isinstance(state["generator_smooth"], dict):
                state = state["generator_smooth"]
            elif any(k.startswith("generator_smooth.") for k in state):
                state = {
                    k[len("generator_smooth."):]: v
                    for k, v in state.items()
                    if k.startswith("generator_smooth.")
                }
            converted = convert.stylegan2_generator(
                {k: np.asarray(v) for k, v in state.items()}
            )
            variables = jax.tree.map(jnp.asarray, converted)

        def synth(frozen, keyk, z):
            out = gen.apply(frozen, z, trunc_psi=0.7, trunc_layers=8)
            const1 = jnp.repeat(
                frozen["params"]["synthesis"]["const"], z.shape[0], axis=0
            )
            return SynthBatch(w1=out["wp"], imgs1=out["image"], const1=const1)

        def resynth(frozen, w, batch, keyk):
            return gen.apply(frozen, w, method=gen.synthesize)["image"]

        enc = Encoder(
            startf=args.start_features, maxf=512, layer_count=layer_count, latent_size=512,
            use_blur=getattr(args, "case", 1) == 2,
        )
        with jax.default_device(cpu):
            img0 = jnp.zeros((1, args.img_size, args.img_size, 3))
            enc_vars = jax.jit(enc.init)({"params": key, "noise": key}, img0)
        if args.checkpoint_dir_E:
            e_state = convert.load_torch_state_dict(args.checkpoint_dir_E)
            enc_vars = {
                **enc_vars,
                "params": jax.tree.map(jnp.asarray, convert.encoder(e_state, layer_count)),
            }
        return GanBundle(
            synth, resynth, enc, enc_vars, 512, layer_count, 2 * layer_count, variables
        )

    if mtype == 3:
        from tpugan.io import convert
        from tpugan.models import PGEncoder, PGGANGenerator
        from tpugan.train.e_align import SynthBatch

        gen = PGGANGenerator(resolution=args.img_size)
        with jax.default_device(cpu):
            z0 = jnp.zeros((1, 512))
            variables = jax.jit(gen.init)(key, z0)
        if not args.random_init:
            state = convert.load_torch_state_dict(args.checkpoint_dir_GAN)
            if any(k.startswith("generator_smooth.") for k in state):
                state = {
                    k[len("generator_smooth."):]: v
                    for k, v in state.items()
                    if k.startswith("generator_smooth.")
                }
            variables = {"params": jax.tree.map(jnp.asarray, convert.pggan_generator(state))}

        def synth(frozen, keyk, z):
            out = gen.apply(frozen, z)
            return SynthBatch(w1=z, imgs1=out["image"], const1=jnp.zeros((z.shape[0], 1)))

        def resynth(frozen, z, batch, keyk):
            return gen.apply(frozen, z)["image"]

        enc = PGEncoder(startf=args.start_features, maxf=512, layer_count=layer_count, latent_size=512)
        with jax.default_device(cpu):
            img0 = jnp.zeros((1, args.img_size, args.img_size, 3))
            enc_vars = jax.jit(enc.init)({"params": key, "noise": key}, img0)
        if args.checkpoint_dir_E:
            e_state = convert.load_torch_state_dict(args.checkpoint_dir_E)
            enc_vars = {
                **enc_vars,
                "params": jax.tree.map(jnp.asarray, convert.pg_encoder(e_state, layer_count)),
            }
        return GanBundle(
            synth, resynth, enc, enc_vars, args.z_dim, layer_count, 2 * layer_count, variables
        )

    if mtype == 4:
        from tpugan.io import convert
        from tpugan.models import BigGAN, BigGANConfig, BigGANEncoder
        from tpugan.train.e_align import SynthBatch
        from tpugan.utils import one_hot, truncated_noise_sample

        cfg = (
            BigGANConfig.from_json_file(args.config_dir)
            if args.config_dir
            else BigGANConfig.for_resolution(args.img_size, z_dim=args.z_dim)
        )
        model = BigGAN(cfg)
        with jax.default_device(cpu):
            z0 = jnp.zeros((1, cfg.z_dim))
            l0 = jnp.zeros((1, cfg.num_classes))
            variables = jax.jit(lambda z, l: model.init(key, z, l, 0.4))(z0, l0)
        if not args.random_init:
            state = convert.load_torch_state_dict(args.checkpoint_dir_GAN)
            variables = jax.tree.map(jnp.asarray, convert.biggan(state))

        truncation = 0.4

        def synth(frozen, keyk, z):
            # BigGAN path draws truncated z and a shared random class
            # (E_align_cropping_s1.py:140-150); z's dtype carries the
            # compute precision chosen by the bf16 wrapper
            kz, kl = jax.random.split(keyk)
            zt = truncated_noise_sample(kz, z.shape[0], cfg.z_dim, truncation)
            zt = zt.astype(z.dtype)
            flag = jax.random.randint(kl, (), 0, cfg.num_classes)
            label = one_hot(jnp.full((z.shape[0],), flag), cfg.num_classes)
            imgs1, cond = model.apply(frozen, zt, label, truncation)
            return SynthBatch(w1=zt, imgs1=imgs1, const1=cond, label=label)

        def resynth(frozen, w2, batch, keyk):
            # regenerate with the same conditions (E_align_cropping_s1.py:162)
            imgs2, _ = model.apply(frozen, w2, batch.label, truncation)
            return imgs2

        enc = BigGANEncoder(
            startf=args.start_features, maxf=512, layer_count=layer_count,
            cond_dim=2 * cfg.z_dim, z_dim=cfg.z_dim,
        )
        with jax.default_device(cpu):
            img0 = jnp.zeros((1, args.img_size, args.img_size, 3))
            c0 = jnp.zeros((1, 2 * cfg.z_dim))
            enc_vars = jax.jit(lambda x, c: enc.init({"params": key, "noise": key}, x, c))(img0, c0)
        if args.checkpoint_dir_E:
            e_state = convert.load_torch_state_dict(args.checkpoint_dir_E)
            converted = convert.biggan_encoder(e_state, layer_count)
            enc_vars = {
                **enc_vars,
                **jax.tree.map(jnp.asarray, converted),
            }
        return GanBundle(
            synth, resynth, enc, enc_vars, cfg.z_dim, layer_count, 2 * layer_count, variables
        )

    raise ValueError(f"unknown mtype {args.mtype}")


def warn_random_weights(flag: str, consequence: str) -> None:
    """Unmissable degradation warning (perceptual nets falling back to
    random/disabled are numerically meaningless vs the reference)."""
    import sys

    bar = "!" * 74
    print(
        f"\n{bar}\nWARNING: --{flag} not provided — {consequence}.\n"
        f"Results will NOT be comparable to the reference pipeline; pass a\n"
        f"local path or URL (downloaded once via tpugan.io.fetch).\n{bar}\n",
        file=sys.stderr,
        flush=True,
    )


def build_lpips_fn(args):
    """LPIPS closure from --lpips_weights (path or URL). The reference
    always trains with real LPIPS (E_align_cropping_s1.py:98); without
    weights the term is DISABLED, loudly."""
    if getattr(args, "lpips_weights", None):
        from tpugan.io import convert
        from tpugan.io.fetch import cached_path
        from tpugan.losses.lpips import make_lpips_fn

        state = convert.load_torch_state_dict(cached_path(args.lpips_weights))
        params = {"params": jax.tree.map(jnp.asarray, convert.lpips_vgg(state))}
        if getattr(args, "bf16", False) and not getattr(args, "fp32_lpips", False):
            # match the benched bf16 configuration (bench.py): bf16 VGG
            # backbone weights + input casts, fp32 distances out — the
            # LPIPS activation stream is a first-class byte consumer.
            # In the training CLIs the perceptual terms are detached /
            # log-only, so this never touches the update trajectory; in
            # the INVERSION CLI the LPIPS term sits in the gradient path
            # (embedding_img.py:92-112), so cli/embedding.py exposes
            # --fp32_lpips to keep the optimization trajectory fp32
            # while still running the frozen G in bf16
            from tpugan.precision import bf16_lpips, cast_floating

            return bf16_lpips(make_lpips_fn(cast_floating(params, jnp.bfloat16)))
        return make_lpips_fn(params)
    warn_random_weights("lpips_weights", "the LPIPS loss term is DISABLED")
    return None


def build_vgg16_vars(args, img_size: int):
    """VGG16 params from --vgg_weights (path or URL); RANDOM weights with a
    loud warning otherwise (Grad-CAM attention over random features is
    structurally exercised but semantically meaningless)."""
    from tpugan.losses.vgg import VGG16

    vgg = VGG16()
    if getattr(args, "vgg_weights", None):
        from tpugan.io import convert
        from tpugan.io.fetch import cached_path

        sd = convert.load_torch_state_dict(cached_path(args.vgg_weights))
        return vgg, {"params": jax.tree.map(jnp.asarray, convert.vgg16(sd))}
    warn_random_weights("vgg_weights", "VGG16 (Grad-CAM/GBP) weights are RANDOM")
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        vgg_vars = jax.jit(vgg.init)(
            jax.random.PRNGKey(7), jnp.zeros((1, img_size, img_size, 3))
        )
    return vgg, vgg_vars


def make_result_dirs(experiment_dir: Optional[str], default_name: str):
    """Mirror the reference's result tree (E_align_cropping_s1.py:318-331)."""
    base = experiment_dir or os.path.join("./result", default_name)
    imgs = os.path.join(base, "imgs")
    models = os.path.join(base, "models")
    for d in (base, imgs, models):
        os.makedirs(d, exist_ok=True)
    return base, imgs, models
