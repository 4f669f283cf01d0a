"""Streamed bounded-memory decode (native DecodeStream / decode_file).

The reference decodes arbitrarily large files in O(window) memory
(lz77.c:148-197, bitio.c:103-121); these tests pin the framework's
equivalent: chunk-fed decoding is byte-identical to the whole-stream
decoders for every chunking, window width, and stream producer (ours and
the C oracle's), and corrupt streams fail loudly.
"""

import os

import numpy as np
import pytest

from lz77_tpu import bitio, native, spec
from lz77_tpu.models import codec

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def _text(rng, n):
    words = [
        rng.integers(97, 123, size=int(rng.integers(2, 9)), dtype=np.uint8)
        .tobytes()
        for _ in range(57)
    ]
    parts, total = [], 0
    while total < n:
        w = words[int(rng.integers(0, len(words)))]
        parts.append(w + b" ")
        total += len(w) + 1
    return b"".join(parts)[:n]


def _stream_decode(stream: bytes, read_chunk: int, out_chunk: int) -> bytes:
    got = bytearray()
    with native.DecodeStream(out_chunk=out_chunk) as ds:
        for i in range(0, len(stream), read_chunk):
            for piece in ds.feed(stream[i : i + read_chunk]):
                got += piece.tobytes()
    return bytes(got)


@pytest.mark.parametrize(
    "params",
    [
        spec.Params(),                    # 12+4+8
        spec.Params(la=255, sb=65535),    # 16+8+8 = 32-bit tokens (widest)
        spec.Params(la=2, sb=3),          # 2+1+8 (narrowest off range)
        spec.Params(la=64, sb=1023),
        spec.Params(la=16, sb=4093),
    ],
)
@pytest.mark.parametrize("read_chunk,out_chunk", [(1, 256), (7, 300), (4096, 1024)])
def test_chunked_equals_in_memory(params, read_chunk, out_chunk):
    rng = np.random.default_rng(0xDEC0)
    data = (
        _text(rng, 40000)
        + b"\x00" * 5000
        + rng.integers(0, 256, 8000, dtype=np.uint8).tobytes()
    )
    stream = native.encode(data, params)
    assert native.decode(stream) == data
    assert _stream_decode(stream, read_chunk, out_chunk) == data


def test_overlap_runs_and_edge_streams():
    rng = np.random.default_rng(1)
    for data in [b"", b"A", b"ab" * 3, b"\x01" * 100000, _text(rng, 500)]:
        stream = native.encode(data, spec.Params())
        assert _stream_decode(stream, 3, 256) == data


def test_decode_file_matches_and_flat_window_state(tmp_path):
    rng = np.random.default_rng(2)
    data = _text(rng, 300000)
    stream = native.encode(data, spec.Params())
    sp, op = tmp_path / "s.lz", tmp_path / "out"
    sp.write_bytes(stream)
    n = native.decode_file(str(sp), str(op), read_chunk=4096, out_chunk=512)
    assert n == len(data)
    assert op.read_bytes() == data


def test_codec_decode_file_routing(tmp_path):
    rng = np.random.default_rng(3)
    data = _text(rng, 60000)
    stream = native.encode(data, spec.Params())
    sp, op = tmp_path / "s.lz", tmp_path / "out"
    sp.write_bytes(stream)
    st = codec.DecodeStats()
    n = codec.decode_file(str(sp), str(op), stats=st)
    assert st.backend == "native-streamed"
    assert n == len(data) and op.read_bytes() == data
    # non-native backend routes through decode_bytes (whole-stream)
    st2 = codec.DecodeStats()
    codec.decode_file(str(sp), str(op), backend="host", stats=st2)
    assert st2.backend == "host" and op.read_bytes() == data


def test_oracle_streams_decode_streamed(tmp_path, oracle):
    """C-encoded streams decode bit-exactly through the streamed decoder."""
    rng = np.random.default_rng(4)
    data = _text(rng, 100000)
    for la, sb in ((None, None), (64, 1023), (255, 65535)):
        stream = oracle.encode(data, la, sb)
        assert _stream_decode(stream, 4096, 4096) == data


def test_corrupt_streams_fail_loudly(tmp_path):
    # invalid header (sb=0)
    with pytest.raises(RuntimeError):
        _stream_decode(b"\x00\x00\x0f\x00" + b"\x01" * 64, 16, 256)
    # offset beyond decoded history
    hdr = bytes([0xFF, 0x0F, 0x0F, 0x00])
    tok = (100 | (3 << 12) | (65 << 16)).to_bytes(3, "little")
    with pytest.raises(RuntimeError):
        _stream_decode(hdr + tok, 16, 256)
    # truncated header via decode_file
    sp = tmp_path / "t.lz"
    sp.write_bytes(b"\xff\x0f")
    with pytest.raises(ValueError):
        native.decode_file(str(sp), str(tmp_path / "o"))


def test_params_and_total_visibility():
    data = b"hello hello hello"
    stream = native.encode(data, spec.Params(la=16, sb=255))
    with native.DecodeStream() as ds:
        assert ds.params() is None
        list(ds.feed(stream[:2]))
        assert ds.params() is None  # header incomplete
        got = b"".join(p.tobytes() for p in ds.feed(stream[2:]))
        p = ds.params()
        assert p is not None and (p.la, p.sb) == (16, 255)
        assert ds.total_out == len(data)
    assert got == data


@pytest.mark.parametrize("la", [129, 200, 100, 17, 3])
def test_crafted_overlong_len_rejected(la):
    # A length field wider than la-1 allows (len_bits = bitof(la) can encode
    # values up to 2^bits - 1 > la - 1) must be rejected as corrupt, not
    # replayed: the streamed decoder reserves only la+1 output bytes per
    # token, so an overlong len would write past its window buffer (and the
    # caller's out slice).  Spec length cap: SURVEY.md 2.3.4.
    p = spec.Params(la=la, sb=4095)
    len_mask = (1 << p.len_bits) - 1
    assert len_mask > la - 1  # the parametrization targets this gap
    # one literal first, so off=1 passes the history bound and the crafted
    # len check is what fires
    off = np.array([0, 1], np.int64)
    length = np.array([0, len_mask], np.int64)
    nxt = np.array([65, 66], np.int64)
    stream = bitio.build_stream(off, length, nxt, p)
    with pytest.raises(RuntimeError, match="corrupt"):
        _stream_decode(stream, len(stream), 4096)
    # whole-stream native decoder applies the same restrict policy
    with pytest.raises((RuntimeError, ValueError)):
        native.decode(stream)


def test_overlong_len_rejected_at_every_feed_granularity():
    # byte-at-a-time feeds must hit the same validation (carry path)
    p = spec.Params(la=129, sb=255)
    stream = bitio.build_stream(
        np.array([0, 1], np.int64),
        np.array([0, 255], np.int64),
        np.array([1, 2], np.int64),
        p,
    )
    with pytest.raises(RuntimeError, match="corrupt"):
        _stream_decode(stream, 1, 4096)
