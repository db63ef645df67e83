"""tools/download_ckpts.py — mocked-opener download tests.

Reference behavior: checkpoints/download_ckpts.sh (wget the four SAM 2.1
checkpoints). Network is mocked (zero-egress environment)."""

import io
import os
import urllib.error

import pytest

from det_sam2_tpu.tools.download_ckpts import (
    BASE_URL,
    CHECKPOINTS,
    download_checkpoints,
    download_one,
    main,
)


class _Resp(io.BytesIO):
    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def test_download_all_models(tmp_path):
    seen = []

    def opener(url, timeout):
        seen.append(url)
        return _Resp(url.encode())

    paths = download_checkpoints(str(tmp_path), opener=opener, log=lambda s: None)
    assert set(paths) == set(CHECKPOINTS)
    for name, (fname, _) in CHECKPOINTS.items():
        p = os.path.join(str(tmp_path), fname)
        assert paths[name] == p
        with open(p, "rb") as f:
            assert f.read() == f"{BASE_URL}/{fname}".encode()
    assert len(seen) == 4
    # no stray .part files
    assert not [f for f in os.listdir(tmp_path) if f.endswith(".part")]


def test_skip_existing_and_retry(tmp_path):
    fname, _ = CHECKPOINTS["tiny"]
    dest = tmp_path / fname
    dest.write_bytes(b"already here")
    calls = []

    def opener(url, timeout):
        calls.append(url)
        return _Resp(b"fresh")

    download_checkpoints(
        str(tmp_path), models=("tiny",), opener=opener, log=lambda s: None
    )
    assert calls == []  # skipped
    assert dest.read_bytes() == b"already here"

    # retry: first attempt raises, second succeeds
    attempts = []

    def flaky(url, timeout):
        attempts.append(url)
        if len(attempts) == 1:
            raise urllib.error.URLError("reset")
        return _Resp(b"ok")

    out = str(tmp_path / "retry.bin")
    download_one("http://x/y", out, opener=flaky, retries=1)
    assert len(attempts) == 2
    with open(out, "rb") as f:
        assert f.read() == b"ok"


def test_failure_raises_clear_error(tmp_path):
    def dead(url, timeout):
        raise urllib.error.URLError("no route to host")

    with pytest.raises(RuntimeError, match="no network egress"):
        download_one("http://x/y", str(tmp_path / "z"), opener=dead, retries=0)
    assert not os.path.exists(tmp_path / "z.part")
    # CLI surfaces it as rc=1 (monkeypatch-free: bad model name is argparse rc 2)
    with pytest.raises(SystemExit):
        main(["--models", "nope"])


def test_unknown_model_rejected(tmp_path):
    with pytest.raises(ValueError, match="unknown model"):
        download_checkpoints(str(tmp_path), models=("nope",), log=lambda s: None)
