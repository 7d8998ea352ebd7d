"""Checkpoint/vocab path resolution + local cache.

API-parity replacement for the reference's download cache (reference
src/lxrt/file_utils.py:81-247: cached_path with S3/HTTP etag caching and a
UNC-mirror fallback, modeling.py:793-804). This framework targets
airgapped/zero-egress TPU pods, so remote URLs resolve ONLY through the
local cache: populate it out-of-band (e.g. `xggm_cache_put`) and
`cached_path` serves hits by url-hash exactly like the reference's cache
layout; a cache miss on a remote URL raises with the expected cache key
instead of attempting a download.
"""
from __future__ import annotations

import hashlib
import json
import os
import shutil
import tarfile
from typing import Optional
from urllib.parse import urlparse

DEFAULT_CACHE = os.path.expanduser(
    os.environ.get("XGGM_CACHE", "~/.cache/xggm_tpu"))


def url_to_filename(url: str, etag: Optional[str] = None) -> str:
    """sha256 cache key (same scheme as the reference, file_utils.py:45-58)."""
    key = hashlib.sha256(url.encode("utf-8")).hexdigest()
    if etag:
        key += "." + hashlib.sha256(etag.encode("utf-8")).hexdigest()
    return key


def cache_put(src_path: str, url: str,
              cache_dir: str = DEFAULT_CACHE) -> str:
    """Register a locally-obtained file under its url's cache key."""
    os.makedirs(cache_dir, exist_ok=True)
    fname = url_to_filename(url)
    dst = os.path.join(cache_dir, fname)
    shutil.copyfile(src_path, dst)
    with open(dst + ".json", "w") as f:
        json.dump({"url": url, "etag": None}, f)
    return dst


def cached_path(url_or_filename: str,
                cache_dir: str = DEFAULT_CACHE) -> str:
    """Resolve a local path / file:// URL / cached remote URL to a local
    file (reference cached_path, file_utils.py:81-110)."""
    parsed = urlparse(url_or_filename)
    if parsed.scheme in ("http", "https", "s3"):
        fname = url_to_filename(url_or_filename)
        path = os.path.join(cache_dir, fname)
        if os.path.exists(path):
            return path
        raise FileNotFoundError(
            f"remote resource {url_or_filename!r} is not in the local cache "
            f"({path}); this environment has no egress - stage the file with "
            f"xggm_tpu.utils.file_cache.cache_put(local_path, url)")
    if os.path.exists(url_or_filename):
        return url_or_filename
    if parsed.scheme == "file":
        if os.path.exists(parsed.path):
            return parsed.path
        raise FileNotFoundError(parsed.path)
    raise FileNotFoundError(
        f"{url_or_filename!r} is neither a local path nor a cached URL")


def extract_archive(path: str, dest: Optional[str] = None) -> str:
    """Untar a pretrained-weights archive (the reference untars HF BERT
    archives on load, modeling.py:806-820)."""
    dest = dest or path + ".extracted"
    if not os.path.isdir(dest):
        os.makedirs(dest, exist_ok=True)
        with tarfile.open(path) as t:
            t.extractall(dest)
    return dest
