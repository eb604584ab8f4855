"""Checkpoint path resolution / optional fetch cache.

Replaces model/utils/biggan_file_utils.py (HF-style URL/S3/etag download
cache, :39-249). The rebuild prefers plain local paths (SURVEY.md §2.2);
when given a URL it downloads once into a local cache directory using the
standard library only (no boto3/requests dependency).
"""

from __future__ import annotations

import hashlib
import os
import urllib.request

DEFAULT_CACHE = os.path.join(
    os.path.expanduser("~"), ".cache", "tpugan"
)

# the reference's hosted BigGAN weights (biggan_generator.py:33-46)
PRETRAINED_BIGGAN = {
    name: (
        f"https://s3.amazonaws.com/models.huggingface.co/biggan/{name}-pytorch_model.bin",
        f"https://s3.amazonaws.com/models.huggingface.co/biggan/{name}-config.json",
    )
    for name in ("biggan-deep-128", "biggan-deep-256", "biggan-deep-512")
}


def cached_path(path_or_url: str, cache_dir: str | None = None) -> str:
    """Local path -> returned as-is (must exist); URL -> download-once cache."""
    if os.path.exists(path_or_url):
        return path_or_url
    if not path_or_url.startswith(("http://", "https://")):
        raise FileNotFoundError(path_or_url)
    cache_dir = cache_dir or DEFAULT_CACHE
    os.makedirs(cache_dir, exist_ok=True)
    fname = hashlib.sha256(path_or_url.encode()).hexdigest()[:16] + "-" + os.path.basename(
        path_or_url
    )
    target = os.path.join(cache_dir, fname)
    if not os.path.exists(target):
        tmp = target + ".tmp"
        urllib.request.urlretrieve(path_or_url, tmp)
        os.replace(tmp, target)
    return target
