"""
Download cache for hosted artifacts (pretrained weights, precalculated datasets).

Capability parity with reference ``util/file_util.py`` (sha256/size-checked
resumable downloader with HF_TOKEN auth). Network egress may be unavailable in
some deployments; every caller treats a failed download as "artifact absent"
and falls back to local generation.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import urllib.request
from typing import Optional

from heybuddy_tpu.utils.log import logger

__all__ = ["get_cache_dir", "check_download_file", "file_sha256", "file_is_downloaded"]


def get_cache_dir(subdir: str = "") -> str:
    base = os.environ.get(
        "HEYBUDDY_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "heybuddy-tpu"),
    )
    path = os.path.join(base, subdir) if subdir else base
    os.makedirs(path, exist_ok=True)
    return path


def file_sha256(path: str, chunk_size: int = 1 << 20) -> str:
    digest = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            chunk = f.read(chunk_size)
            if not chunk:
                break
            digest.update(chunk)
    return digest.hexdigest()


def file_is_downloaded(
    path: str,
    expected_sha256: Optional[str] = None,
    expected_size: Optional[int] = None,
) -> bool:
    """True when the file exists and passes whichever integrity checks are known."""
    if not os.path.exists(path):
        return False
    if expected_size is not None and os.path.getsize(path) != expected_size:
        return False
    if expected_sha256 is not None and file_sha256(path) != expected_sha256:
        return False
    return True


def check_download_file(
    url: str,
    dest_path: Optional[str] = None,
    expected_sha256: Optional[str] = None,
    timeout: float = 60.0,
) -> str:
    """
    Download ``url`` into the cache (or ``dest_path``) unless already present and
    valid. Sends ``Authorization: Bearer $HF_TOKEN`` for huggingface URLs when
    the token is set. Raises on failure; callers decide whether that is fatal.
    """
    if dest_path is None:
        dest_path = os.path.join(get_cache_dir("downloads"), os.path.basename(url.split("?")[0]))
    if file_is_downloaded(dest_path, expected_sha256=expected_sha256):
        return dest_path

    tmp_path = dest_path + ".part"
    request = urllib.request.Request(url)
    token = os.environ.get("HF_TOKEN")
    if token and "huggingface.co" in url:
        request.add_header("Authorization", f"Bearer {token}")

    logger.info(f"Downloading {url} -> {dest_path}")
    with urllib.request.urlopen(request, timeout=timeout) as response, open(tmp_path, "wb") as out:
        shutil.copyfileobj(response, out)

    if expected_sha256 is not None:
        actual = file_sha256(tmp_path)
        if actual != expected_sha256:
            os.remove(tmp_path)
            raise IOError(f"SHA256 mismatch for {url}: expected {expected_sha256}, got {actual}")
    os.replace(tmp_path, dest_path)
    return dest_path
