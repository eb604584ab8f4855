"""Directory-pair metric harness (rebuild of comparing-baseline.py:46-88).

Walks two image directories in sorted order, resizes to ``img_size``, and
reports running means of PSNR / SSIM / LPIPS / MSE / cosine.
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from tpugan.eval.metrics import pair_metrics
from tpugan.io.image import load_image


def compare_dirs(
    dir1: str,
    dir2: str,
    img_size: int = 512,
    lpips_fn=None,
    verbose: bool = True,
):
    """Returns dict of mean metrics over the paired files."""
    exts = (".png", ".jpg", ".jpeg")
    files1 = sorted(os.path.join(dir1, f) for f in os.listdir(dir1) if f.lower().endswith(exts))
    files2 = sorted(os.path.join(dir2, f) for f in os.listdir(dir2) if f.lower().endswith(exts))
    sums = {"psnr": 0.0, "ssim": 0.0, "lpips": 0.0, "mse": 0.0, "cosine": 0.0}
    n = 0
    for f1, f2 in zip(files1, files2):
        a = jnp.asarray(load_image(f1, img_size))
        b = jnp.asarray(load_image(f2, img_size))
        m = pair_metrics(a, b, lpips_fn=lpips_fn)
        n += 1
        for k in sums:
            sums[k] += float(getattr(m, k))
        if verbose:
            print(
                f"img_num:{n}--psnr:{sums['psnr']/n:f}--ssim:{sums['ssim']/n:f}"
                f"--mse_value:{sums['mse']/n:f}--lpips_value:{sums['lpips']/n:f}"
                f"--cosine_value:{sums['cosine']/n:f}"
            )
    if n == 0:
        raise FileNotFoundError("no paired images found")
    return {k: v / n for k, v in sums.items()}
