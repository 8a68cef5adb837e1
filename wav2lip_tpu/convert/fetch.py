"""Model-zoo weight fetch fallback.

The reference falls back to downloading the S3FD weights when no local file
exists (sfd_detector.py:11-24, ``load_url`` of the python-fan model zoo).
Same capability here: ``resolve_s3fd_checkpoint(None)`` looks in
``checkpoints/``, then downloads to it — with a sha256 check against the
hash embedded in the filename (torch-hub convention) — and degrades with an
actionable error when offline.
"""

from __future__ import annotations

import hashlib
import os
import re
from typing import Optional

S3FD_URL = "https://www.adrianbulat.com/downloads/python-fan/s3fd-619a316812.pth"
_DEFAULT_DIR = "checkpoints"


def _hash_ok(path: str, url: str) -> bool:
    """torch-hub filenames embed a sha256 prefix: s3fd-<hex>.pth."""
    m = re.search(r"-([0-9a-f]{6,})\.pth$", os.path.basename(url))
    if not m:
        return True
    want = m.group(1)
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest().startswith(want)


def fetch_to(url: str, dest_path: str, timeout: float = 30.0) -> str:
    """Download ``url`` → ``dest_path`` (atomic rename), verifying the
    filename-embedded hash. Raises RuntimeError offline/corrupt."""
    import urllib.request

    os.makedirs(os.path.dirname(os.path.abspath(dest_path)), exist_ok=True)
    # per-process temp name: concurrent preprocess shards (--shard i of n)
    # may all hit a cold cache at once, and a shared .part file would be
    # interleaved by both writers and then fail the hash for everyone
    tmp = f"{dest_path}.{os.getpid()}.part"
    try:
        with urllib.request.urlopen(url, timeout=timeout) as r, \
                open(tmp, "wb") as f:
            while True:
                chunk = r.read(1 << 20)
                if not chunk:
                    break
                f.write(chunk)
        if not _hash_ok(tmp, url):
            raise RuntimeError(f"downloaded {url} failed its sha256 check")
    except Exception as e:
        if os.path.exists(tmp):
            os.remove(tmp)
        # a concurrent fetch may have won the race — but only trust a
        # pre-existing dest if it passes the hash (a stale/corrupt file at
        # dest_path must not masquerade as the winner)
        if os.path.exists(dest_path) and _hash_ok(dest_path, url):
            return dest_path
        if isinstance(e, RuntimeError):
            raise
        raise RuntimeError(
            f"could not download {url} ({e!r}); place the file at "
            f"{dest_path} manually or pass an explicit checkpoint path"
        ) from e
    os.replace(tmp, dest_path)  # atomic; last finisher wins with valid bytes
    return dest_path


def resolve_s3fd_checkpoint(path: Optional[str],
                            cache_dir: str = _DEFAULT_DIR) -> str:
    """Return a usable S3FD ``.pth`` path.

    Priority: explicit ``path`` (must exist) → ``{cache_dir}/s3fd.pth`` or
    the model-zoo filename already on disk → download (reference parity:
    sfd_detector.py:20-24). Raises with a clear message when none works.
    """
    if path:
        if os.path.exists(path):
            return path
        raise FileNotFoundError(f"--s3fd_checkpoint not found: {path}")
    for cand in (os.path.join(cache_dir, "s3fd.pth"),
                 os.path.join(cache_dir, os.path.basename(S3FD_URL))):
        if os.path.exists(cand):
            return cand
    dest = os.path.join(cache_dir, os.path.basename(S3FD_URL))
    print(f"[wav2lip_tpu] s3fd weights not found; downloading {S3FD_URL} "
          f"-> {dest}")
    return fetch_to(S3FD_URL, dest)
