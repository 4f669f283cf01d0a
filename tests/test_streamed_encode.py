"""Streamed bounded-memory native encode (VERDICT r4 missing #1 / next #4).

The reference encodes arbitrarily large files in O(window) memory through
its FILE loop (lz77.c:51-140, bitio.c:80-101).  These tests pin the native
EncodeStream state machine: byte-identical streams to the in-memory
encoder at every feed granularity, across parameter classes (including
dlim < la, where the compaction cursor can overtake the lazy-insert
cursor), and through the CLI surfaces.
"""

import subprocess
import sys

import numpy as np
import pytest

from lz77_tpu import native, spec


def _stream_encode(data: bytes, params, feed_chunk: int) -> bytes:
    got = bytearray()
    with native.EncodeStream(params) as es:
        for i in range(0, len(data), feed_chunk):
            got += es.feed(data[i : i + feed_chunk]).tobytes()
        got += es.finish().tobytes()
    return bytes(got)


@pytest.mark.parametrize(
    "params",
    [
        spec.Params(),                      # 12+4+8
        spec.Params(la=255, sb=65535),      # 16+8+8 = 32-bit tokens
        spec.Params(la=255, sb=3),          # dlim=3 < max_len=254
        spec.Params(la=2, sb=1023),         # minimum lookahead
        spec.Params(la=100, sb=255),
        spec.Params(la=17, sb=4093),
    ],
)
@pytest.mark.parametrize("feed_chunk", [1, 7, 4096, 1 << 20])
def test_streamed_encode_identity(params, feed_chunk, rng):
    from conftest import make_text

    data = (
        make_text(rng, 60_000)
        + b"\x00" * 20_000
        + rng.integers(0, 256, 10_000, dtype=np.uint8).tobytes()
        + b"ab" * 5_000
    )
    ref = native.encode(data, params, threads=1)
    assert _stream_encode(data, params, feed_chunk) == ref


@pytest.mark.parametrize("data", [b"", b"x", b"ab", b"\x00" * 14])
def test_streamed_encode_tiny_inputs(data):
    p = spec.Params()
    assert _stream_encode(data, p, 1) == native.encode(data, p, threads=1)


def test_streamed_encode_many_windows(rng):
    # Input spanning many compaction cycles of a small window: the buffer
    # memmove + absolute-position staleness logic is what's under test.
    p = spec.Params(la=32, sb=255)
    data = (
        rng.integers(0, 8, 400_000, dtype=np.uint8).tobytes()
        + b"\x00" * 100_000
    )
    ref = native.encode(data, p, threads=1)
    for chunk in (1023, 65536):
        assert _stream_encode(data, p, chunk) == ref
    assert native.decode(ref) == data


def test_streamed_encode_fuzz(rng, oracle):
    for _ in range(10):
        la = int(rng.integers(2, 256))
        while True:
            sb = int(rng.integers(2, 66000))
            if not spec.is_degenerate_sb(sb) and sb <= 65535:
                break
        p = spec.Params(la=la, sb=sb)
        n = int(rng.integers(0, 60_000))
        kind = int(rng.integers(0, 3))
        if kind == 0:
            data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        elif kind == 1:
            data = rng.integers(0, 3, n, dtype=np.uint8).tobytes()
        else:
            pat = rng.integers(0, 256, max(int(rng.integers(1, 200)), 1),
                               dtype=np.uint8).tobytes()
            data = (pat * (n // len(pat) + 1))[:n]
        ref = native.encode(data, p, threads=1)
        chunk = int(rng.integers(1, 70_000))
        assert _stream_encode(data, p, chunk) == ref
        assert oracle.decode(ref) == data


def test_encode_file_streams(tmp_path, rng):
    from conftest import make_text

    data = make_text(rng, 250_000)
    ip = tmp_path / "in"
    ip.write_bytes(data)
    op = tmp_path / "out.lz"
    n_in, n_out = native.encode_file(str(ip), str(op), read_chunk=30_000)
    assert (n_in, n_out) == (len(data), op.stat().st_size)
    assert op.read_bytes() == native.encode(data, threads=1)


def test_cli_native_backend_streams_with_rss_report(tmp_path, rng):
    """--backend native encodes file-to-file (no whole-input read) and the
    report carries the process's own peak RSS (VmHWM semantics)."""
    import json

    from conftest import make_text

    data = make_text(rng, 200_000)
    ip = tmp_path / "in"
    ip.write_bytes(data)
    op = tmp_path / "out.lz"
    res = subprocess.run(
        [sys.executable, "-m", "lz77_tpu.cli", "-c", "-i", str(ip),
         "-o", str(op), "--backend", "native", "--report"],
        capture_output=True, text=True,
    )
    assert res.returncode == 0, res.stderr
    rep = json.loads(res.stderr.strip().splitlines()[-1])
    assert rep["backend"] == "native-streamed"
    assert rep["peak_rss_mb"] > 0
    assert op.read_bytes() == native.encode(data, threads=1)
    # explicit --threads 2 keeps the in-memory MT path, identical stream
    res = subprocess.run(
        [sys.executable, "-m", "lz77_tpu.cli", "-c", "-i", str(ip),
         "-o", str(op), "--backend", "native", "--threads", "2"],
        capture_output=True, text=True,
    )
    assert res.returncode == 0, res.stderr
    assert op.read_bytes() == native.encode(data, threads=1)


def test_native_cli_binary_streams_and_reports(tmp_path, rng):
    import json

    from conftest import make_text

    cli = native.build_cli()
    data = make_text(rng, 150_000)
    ip = tmp_path / "in"
    ip.write_bytes(data)
    op = tmp_path / "out.lz"
    res = subprocess.run(
        [cli, "-c", "-i", str(ip), "-o", str(op), "-r"],
        capture_output=True, text=True,
    )
    assert res.returncode == 0, res.stderr
    rep = json.loads(res.stderr.strip().splitlines()[-1])
    assert rep["mode"] == "encode" and rep["peak_rss_mb"] > 0
    # the standalone binary's RSS is true tens-of-MB territory (no
    # interpreter): generous bound still catches whole-input buffering
    assert rep["peak_rss_mb"] < 100
    assert op.read_bytes() == native.encode(data, threads=1)
    dec = tmp_path / "round"
    res = subprocess.run(
        [cli, "-d", "-i", str(op), "-o", str(dec), "-r"],
        capture_output=True, text=True,
    )
    assert res.returncode == 0, res.stderr
    rep = json.loads(res.stderr.strip().splitlines()[-1])
    assert rep["mode"] == "decode" and rep["output_bytes"] == len(data)
    assert dec.read_bytes() == data
