"""Scalar-core decode walk kernel (interpret mode on CPU).

The kernel replays the reference decoder's byte-serial copy loop
(lz77.c:164-195) on the TensorCore scalar unit; these tests assert it is
byte-exact against the host decoder on every input class, including the
overlapping-copy (off < len) RLE case the reference leans on for runs.
"""

import numpy as np
import pytest

from lz77_tpu import bitio, native, spec
from lz77_tpu.models import codec
from lz77_tpu.ops import decode_walk

from conftest import make_text


def _walk_decode(stream: bytes, tchunk: int = 256) -> bytes:
    p, off, ln, nxt = bitio.parse_stream(stream)
    return decode_walk.decode_tokens_walk(
        off.astype(np.int32), ln.astype(np.int32), nxt.astype(np.int32),
        off_bits=p.off_bits, tchunk=tchunk, interpret=True,
    )


@pytest.mark.parametrize(
    "make",
    [
        lambda rng: make_text(rng, 100_000),
        lambda rng: b"\x00" * 50_000,                      # overlap off<len
        lambda rng: b"ab" * 25_000,                        # period-2 overlap
        lambda rng: rng.integers(0, 256, 30_000, dtype=np.uint8).tobytes(),
        lambda rng: b"A",
        lambda rng: b"",
    ],
)
def test_walk_decode_matches_host(make, rng):
    data = make(rng)
    stream = codec.encode_bytes(data, spec.Params())
    assert _walk_decode(stream) == data
    assert codec.decode_bytes(stream) == data


def test_walk_decode_nondefault_params(rng):
    """Non-default (still byte-aligned-irrelevant) window parameters."""
    data = make_text(rng, 40_000)
    p = spec.Params(la=32, sb=255)
    stream = codec.encode_bytes(data, p)
    assert _walk_decode(stream) == data


def test_walk_decode_c_oracle_stream(oracle, rng):
    """Decode a stream the C reference encoder produced."""
    data = make_text(rng, 60_000)
    assert _walk_decode(oracle.encode(data)) == data


def test_walk_decode_off_bits_gate():
    """Rings wider than the SMEM budget are rejected (host path handles).

    No valid header produces off_bits > 16 (sb <= 65535, main.c:37) — the
    gate is a guard against malformed routing, not a product limit.
    """
    with pytest.raises(ValueError):
        decode_walk.walk_decode(
            np.zeros((1, decode_walk.ROWS, 256), np.int32),
            1, ng=1, tchunk=256, off_bits=17, out_cap=decode_walk.TILE,
            interpret=True,
        )


def test_walk_decode_max_window(rng):
    """sb=65535 (off_bits=16, the CLI maximum) decodes through the walk
    kernel — the 512 KiB SMEM ring covers the full reference range.  The
    input repeats a shuffled page at distance ~48k so matches genuinely
    exercise offsets far beyond the old 13-bit ceiling."""
    page = rng.integers(0, 256, 48_000, dtype=np.uint8).tobytes()
    data = page + make_text(rng, 8_000) + page
    p = spec.Params(sb=65535)
    stream = codec.encode_bytes(data, p)
    _, off, _, _ = bitio.parse_stream(stream)
    assert int(off.max()) > (1 << 13)  # wide offsets actually present
    assert _walk_decode(stream, tchunk=2048) == data


def test_walk_decode_tile_boundary_runs(rng):
    """Many tiny tokens forcing multi-tile flushes inside one sub-chunk."""
    data = bytes(rng.integers(0, 4, 12_000, dtype=np.uint8))
    stream = codec.encode_bytes(data, spec.Params(la=3, sb=255))
    assert _walk_decode(stream, tchunk=128) == data


def test_codec_device_dispatch_walk(rng):
    """codec.decode_bytes(backend='device') routes to the walk kernel when
    the window fits, and records the routed backend (ADVICE r2)."""
    data = make_text(rng, 30_000)
    stream = codec.encode_bytes(data, spec.Params())  # off_bits=12 <= 13
    st = codec.DecodeStats()
    out = codec.decode_bytes(
        stream, backend="device", stats=st, device_interpret=True
    )
    assert out == data
    assert st.backend == "device-walk"
    assert st.requested == "device"
    assert st.output_bytes == len(data)


def test_codec_device_dispatch_max_window_walk(rng):
    """sb=65535 (the CLI maximum) now routes to the walk kernel: the SMEM
    ring covers the full reference window range."""
    data = make_text(rng, 20_000)
    stream = codec.encode_bytes(data, spec.Params(sb=65535))  # off_bits=16
    st = codec.DecodeStats()
    out = codec.decode_bytes(
        stream, backend="device", stats=st, device_interpret=True
    )
    assert out == data
    assert st.backend == "device-walk"


def test_codec_device_dispatch_wide_window_fallback(rng, monkeypatch):
    """Streams wider than the ring budget fall back to the chunked XLA
    decoder — loudly, with the backend recorded.  No valid header exceeds
    the real ceiling (16 bits), so the ceiling is pinned down for the test."""
    monkeypatch.setattr(decode_walk, "MAX_OFF_BITS", 13)
    data = make_text(rng, 20_000)
    stream = codec.encode_bytes(data, spec.Params(sb=65535))  # off_bits=16
    st = codec.DecodeStats()
    with pytest.warns(RuntimeWarning, match="walk-kernel ceiling"):
        out = codec.decode_bytes(
            stream, backend="device", stats=st, device_interpret=True
        )
    assert out == data
    assert st.backend == "device-chunked"


def test_codec_device_dispatch_cpu_guard(rng):
    """On CPU hosts (this suite) backend='device' without interpret must NOT
    try to compile the Mosaic kernel — it routes to the chunked decoder."""
    data = make_text(rng, 20_000)
    stream = codec.encode_bytes(data, spec.Params())
    st = codec.DecodeStats()
    out = codec.decode_bytes(stream, backend="device", stats=st)
    assert out == data
    assert st.backend in ("device-walk", "device-chunked")
    # this suite pins JAX to CPU, so the walk must have run interpreted or
    # been skipped — either way the call must succeed (the r2 advisor found
    # it raised a Mosaic lowering error here).


@pytest.mark.parametrize(
    "name,data,params",
    [
        ("text", None, spec.Params()),            # filled by rng below
        ("zeros", b"\x00" * 60_000, spec.Params()),     # off=1 splat
        ("off2", b"ab" * 20_000, spec.Params()),        # off=2 serial path
        ("off3", b"abc" * 12_000, spec.Params()),       # off=3 serial path
        ("off4", b"abcd" * 12_000, spec.Params()),      # off=4 word boundary
        ("off7", b"abcdefg" * 7_000, spec.Params()),    # misaligned funnel
        ("wide", None, spec.Params(la=15, sb=65535)),   # off_bits=16 ring
        ("tiny", b"x", spec.Params()),
    ],
)
def test_packed_ring_variant_bit_exact(name, data, params, rng):
    """Packed-ring walk decode (4 bytes/word, funnel shifts): bit-exact on
    every overlap class.  Measured slower than the byte-ring kernel on v5e
    (see the module docstring's dead-end record) but kept correct."""
    if data is None:
        data = make_text(rng, 120_000)
    stream = native.encode(data, params)
    p2, off, ln, nxt = bitio.parse_stream(stream)
    got = decode_walk.decode_tokens_walk_packed(
        off.astype(np.int32), ln.astype(np.int32), nxt.astype(np.int32),
        off_bits=p2.off_bits, interpret=True,
    )
    assert got == data
