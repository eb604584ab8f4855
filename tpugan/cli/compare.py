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

    from tpugan.cli.common import build_lpips_fn

    lpips_fn = build_lpips_fn(args)

    result = compare_dirs(args.dir1, args.dir2, args.img_size, lpips_fn=lpips_fn)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
