"""Lazy download reader + fetch_params (downloadreader.rs:6-84,
lib.rs:143-262) — exercised offline through injectable openers."""

import hashlib
import io

import pytest

from masp_tpu.groth16.params_io import ParameterError, fetch_params
from masp_tpu.utils.downloadreader import ResponseLazyReader
from masp_tpu.utils.hashreader import HashReader


class FlakyStream(io.RawIOBase):
    """Streams `data`, erroring after `fail_after` bytes if set."""

    def __init__(self, data, fail_after=None):
        self.data = data
        self.pos = 0
        self.fail_after = fail_after

    def read(self, n=-1):
        if self.fail_after is not None and self.pos >= self.fail_after:
            raise ConnectionError("mid-stream failure")
        end = len(self.data) if n < 0 else min(self.pos + n, len(self.data))
        if self.fail_after is not None:
            end = min(end, self.fail_after)
        out = self.data[self.pos : end]
        self.pos = end
        return out


def test_lazy_open_and_stream():
    opened = []

    def opener():
        opened.append(True)
        return FlakyStream(b"abcdef" * 100)

    r = ResponseLazyReader(opener)
    assert not opened  # Request state: nothing opened yet
    assert r.read(6) == b"abcdef"
    assert opened
    rest = r.read()
    assert rest == b"abcdef" * 99
    assert r.read(10) == b""  # Complete(Ok): EOF forever
    assert r.read(10) == b""


def test_request_failure_is_sticky():
    def opener():
        raise OSError("no egress")

    r = ResponseLazyReader(opener)
    with pytest.raises(OSError, match="download request failed"):
        r.read(1)
    with pytest.raises(OSError, match="download request failed"):
        r.read(1)  # Complete(Err): same error again


def test_midstream_failure_is_sticky():
    r = ResponseLazyReader(lambda: FlakyStream(b"x" * 10, fail_after=4))
    assert r.read(4) == b"xxxx"
    with pytest.raises(OSError, match="download response failed"):
        r.read(4)
    with pytest.raises(OSError, match="download response failed"):
        r.read(4)


def test_zero_sized_read():
    r = ResponseLazyReader(lambda: FlakyStream(b"abc"))
    assert r.read(0) == b""


def test_fetch_params_downloads_and_verifies(tmp_path):
    data = b"\x07" * 4096
    h = hashlib.blake2b(data, digest_size=64).hexdigest()
    path = fetch_params(
        "test.params", h, len(data), params_dir=tmp_path,
        opener=lambda: FlakyStream(data),
    )
    assert path.read_bytes() == data
    # second call: file exists, re-verified without the opener
    boom = lambda: (_ for _ in ()).throw(AssertionError("must not re-download"))
    assert fetch_params("test.params", h, len(data), params_dir=tmp_path,
                        opener=boom) == path


def test_fetch_params_rejects_bad_hash_and_cleans_up(tmp_path):
    data = b"\x07" * 4096
    with pytest.raises(ParameterError, match="hash"):
        fetch_params(
            "bad.params", "00" * 64, len(data), params_dir=tmp_path,
            opener=lambda: FlakyStream(data),
        )
    assert not (tmp_path / "bad.params").exists()  # partial file removed


def test_fetch_params_rejects_truncated_download(tmp_path):
    data = b"\x07" * 100
    h = hashlib.blake2b(data, digest_size=64).hexdigest()
    with pytest.raises(ParameterError, match="bytes"):
        fetch_params(
            "short.params", h, 200, params_dir=tmp_path,
            opener=lambda: FlakyStream(data),
        )
    assert not (tmp_path / "short.params").exists()


def test_fetch_params_never_reads_past_expected(tmp_path):
    # a server streaming extra bytes must not grow the file (take() guard)
    data = b"\x07" * 4096
    h = hashlib.blake2b(data, digest_size=64).hexdigest()
    path = fetch_params(
        "take.params", h, len(data), params_dir=tmp_path,
        opener=lambda: FlakyStream(data + b"EXTRA-GARBAGE"),
    )
    assert path.stat().st_size == len(data)


def test_hashreader_through_download():
    data = b"masp parameter bytes"
    r = HashReader(ResponseLazyReader(lambda: FlakyStream(data)))
    out = b""
    while True:
        chunk = r.read(7)
        if not chunk:
            break
        out += chunk
    assert out == data
    assert r.into_hash() == hashlib.blake2b(data, digest_size=64).hexdigest()
