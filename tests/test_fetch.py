"""S3FD weight resolution/fallback (reference sfd_detector.py:11-24)."""

import hashlib
import os

import pytest

from wav2lip_tpu.convert import fetch
from wav2lip_tpu.convert.fetch import resolve_s3fd_checkpoint


def test_explicit_path_wins(tmp_path):
    p = tmp_path / "weights.pth"
    p.write_bytes(b"x")
    assert resolve_s3fd_checkpoint(str(p)) == str(p)


def test_explicit_missing_path_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        resolve_s3fd_checkpoint(str(tmp_path / "nope.pth"))


def test_cache_dir_hit_no_download(tmp_path):
    cache = tmp_path / "ckpts"
    cache.mkdir()
    (cache / "s3fd.pth").write_bytes(b"x")
    assert resolve_s3fd_checkpoint(None, cache_dir=str(cache)) == str(
        cache / "s3fd.pth"
    )


def test_offline_download_degrades_gracefully(tmp_path, monkeypatch):
    """Zero-egress environments get an actionable error, not a hang or a
    stack bomb."""
    import urllib.request

    def boom(*a, **k):
        raise OSError("network unreachable")

    monkeypatch.setattr(urllib.request, "urlopen", boom)
    with pytest.raises(RuntimeError, match="place the file"):
        resolve_s3fd_checkpoint(None, cache_dir=str(tmp_path))
    assert not list(tmp_path.iterdir())  # no partial files left behind


def test_download_hash_check(tmp_path, monkeypatch):
    """The torch-hub filename hash is enforced on downloaded bytes."""
    import io
    import urllib.request

    payload = b"model-bytes"
    digest = hashlib.sha256(payload).hexdigest()

    class FakeResp(io.BytesIO):
        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

    monkeypatch.setattr(urllib.request, "urlopen",
                        lambda url, timeout=0: FakeResp(payload))

    good = fetch.fetch_to(
        f"https://example.com/s3fd-{digest[:10]}.pth",
        str(tmp_path / "good.pth"),
    )
    assert open(good, "rb").read() == payload

    with pytest.raises(RuntimeError, match="sha256"):
        fetch.fetch_to(
            "https://example.com/s3fd-0123456789.pth",
            str(tmp_path / "bad.pth"),
        )
    assert not os.path.exists(tmp_path / "bad.pth")
