"""Checkpoint downloader (download_ckpt.py:21-29 parity) — offline paths."""

import io
import os
import urllib.error

import pytest

from one2345_tpu.utils import download_ckpt as dl


def test_url_table_matches_reference():
    assert set(dl.CKPTS) == {
        "zero123-xl.ckpt",
        "sam_vit_h_4b8939.pth",
        "indoor_ds_new.ckpt",
        "ckpt_215000.pth",
    }
    for url, min_mb in dl.CKPTS.values():
        assert url.startswith("https://huggingface.co/One-2-3-45/code/resolve/main")
        assert min_mb >= 1


def test_no_egress_fails_fast_with_guidance(tmp_path, monkeypatch):
    def deny(req, timeout=None):
        raise urllib.error.URLError(OSError("network unreachable"))

    monkeypatch.setattr(dl.urllib.request, "urlopen", deny)
    with pytest.raises(dl.DownloadError) as e:
        dl.download_one("indoor_ds_new.ckpt", str(tmp_path))
    msg = str(e.value)
    assert "indoor_ds_new.ckpt" in msg and "place it at" in msg


def test_small_response_rejected(tmp_path, monkeypatch):
    class FakeResponse(io.BytesIO):
        status = 200

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    monkeypatch.setattr(
        dl.urllib.request, "urlopen",
        lambda req, timeout=None: FakeResponse(b"<html>rate limited</html>"),
    )
    with pytest.raises(dl.DownloadError, match="error page"):
        dl.download_one("ckpt_215000.pth", str(tmp_path))
    # the partial file must not be promoted to the final name
    assert not os.path.exists(tmp_path / "ckpt_215000.pth")


def test_existing_file_short_circuits(tmp_path, monkeypatch):
    dest = tmp_path / "ckpt_215000.pth"
    dest.write_bytes(b"\0" * (2 << 20))  # above the 1 MB plausibility floor

    def boom(*a, **k):
        raise AssertionError("must not hit the network")

    monkeypatch.setattr(dl.urllib.request, "urlopen", boom)
    assert dl.download_one("ckpt_215000.pth", str(tmp_path)) == str(dest)


def test_unknown_name_rejected(tmp_path):
    with pytest.raises(KeyError):
        dl.download_one("nope.ckpt", str(tmp_path))
