"""Metric-table CLI (comparing-baseline.py).

``python -m tpugan.cli.compare --dir1 ./generations --dir2 ./recs
--img_size 512 [--lpips_weights lpips_vgg.pth]``
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    parser = argparse.ArgumentParser(description="paired-directory metrics")
    parser.add_argument("--dir1", required=True)
    parser.add_argument("--dir2", required=True)
    parser.add_argument("--img_size", type=int, default=512)
    parser.add_argument("--lpips_weights", default=None)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from tpugan.eval.compare import compare_dirs

    lpips_fn = None
    if not args.lpips_weights:
        from tpugan.cli.common import warn_random_weights

        warn_random_weights("lpips_weights", "the LPIPS column is DISABLED")
    if args.lpips_weights:
        from tpugan.io import convert
        from tpugan.losses.lpips import make_lpips_fn

        state = convert.load_torch_state_dict(args.lpips_weights)
        params = {"params": jax.tree.map(jnp.asarray, convert.lpips_vgg(state))}
        lpips_fn = make_lpips_fn(params)

    result = compare_dirs(args.dir1, args.dir2, args.img_size, lpips_fn=lpips_fn)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
