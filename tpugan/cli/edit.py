"""Latent-editing CLI (embeded_img_edit.py).

``python -m tpugan.cli.edit --mtype 1 --w_path id0-i0-w.npy
--direction age.npy --bonus 3 --start 0 --end 18 --out edited.png``
"""

from __future__ import annotations

import argparse

import numpy as np

from tpugan.cli.common import add_common_args, build_bundle


def main(argv=None):
    parser = argparse.ArgumentParser(description="latent direction editing")
    add_common_args(parser, training=False)
    parser.add_argument("--w_path", required=True, help="inverted w code (.npy or torch .pt)")
    parser.add_argument("--direction", required=True, help="direction .npy [1,512]")
    parser.add_argument("--bonus", type=float, default=3.0)
    parser.add_argument("--start", type=int, default=0)
    parser.add_argument("--end", type=int, default=18)
    parser.add_argument("--out", default="./edited.png")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from tpugan.invert.edit import edit_latent, load_direction
    from tpugan.io.image import save_image, to_unit

    bundle = build_bundle(args)

    if args.w_path.endswith(".npy"):
        w = np.load(args.w_path)
    else:  # reference torch .pt w codes (embeded_img_edit.py:31)
        from tpugan.io.convert import load_torch_state_dict
        import torch

        w = torch.load(args.w_path, map_location="cpu", weights_only=False)
        w = np.asarray(w.detach() if hasattr(w, "detach") else w)
    w = jnp.asarray(w.reshape(1, -1, 512))

    direction = load_direction(args.direction)
    w_edited = edit_latent(w, direction, args.bonus, args.start, args.end)
    img = bundle.resynth(bundle.frozen, w_edited, None, jax.random.PRNGKey(0))
    save_image(args.out, np.clip(to_unit(np.asarray(img[0])), 0, 1))
    print(args.out)


if __name__ == "__main__":
    main()
