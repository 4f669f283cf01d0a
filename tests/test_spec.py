"""Format-spec unit tests: bitof, widths, golden bitstream vectors."""

import numpy as np
import pytest

from lz77_tpu import bitio, spec


def test_bitof_matches_reference_table():
    # ceil(log2(n)) for the reference's whole parameter range.
    import math

    for n in range(1, 65536):
        expected = math.ceil(math.log2(n)) if n > 1 else 0
        assert spec.bitof(n) == expected
    assert spec.bitof(1) == 0
    assert spec.bitof(2) == 1
    assert spec.bitof(4095) == 12
    assert spec.bitof(4096) == 12
    assert spec.bitof(65535) == 16


def test_bitof_rejects_zero():
    with pytest.raises(ValueError):
        spec.bitof(0)


def test_default_token_width_is_24():
    p = spec.Params()
    assert (p.off_bits, p.len_bits, p.width) == (12, 4, 24)


def test_d_limit_safe_for_degenerate_sizes():
    assert spec.d_limit(4095) == 4095
    assert spec.d_limit(4096) == 4095  # power of two restricted
    assert spec.d_limit(1) == 0  # literals only
    assert spec.d_limit(2) == 1
    assert spec.d_limit(3) == 3


def test_degenerate_sb_detection():
    assert spec.is_degenerate_sb(1)
    assert spec.is_degenerate_sb(1024)
    assert spec.is_degenerate_sb(4096)
    assert not spec.is_degenerate_sb(4095)
    assert not spec.is_degenerate_sb(1025)


def test_params_validation():
    with pytest.raises(ValueError):
        spec.Params(la=1)
    with pytest.raises(ValueError):
        spec.Params(la=256)
    with pytest.raises(ValueError):
        spec.Params(sb=0)
    with pytest.raises(ValueError):
        spec.Params(sb=65536)


def test_header_golden_vector():
    """Default-parameter header bytes are ff 0f 0f 00 (SURVEY.md §2.3.1)."""
    stream = bitio.build_stream(
        np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0, np.int64),
        spec.Params(),
    )
    assert stream == bytes.fromhex("ff0f0f00")


def test_literal_token_golden_vector():
    """Literal 'A' at defaults -> bytes 00 00 41 (SURVEY.md §2.3.3)."""
    stream = bitio.build_stream(
        np.array([0]), np.array([0]), np.array([ord("A")]), spec.Params()
    )
    assert stream[4:] == bytes.fromhex("000041")


def test_match_token_bit_layout():
    """off=5, len=3, next=0xAB at defaults: 12+4+8 LSB-first bits."""
    stream = bitio.build_stream(
        np.array([5]), np.array([3]), np.array([0xAB]), spec.Params()
    )
    body = stream[4:]
    # off=5 -> bits 101000000000 ; byte0 = 0b00000101
    assert body[0] == 0x05
    # byte1: low nibble = off bits 8..11 (0), high nibble = len=3
    assert body[1] == 0x30
    assert body[2] == 0xAB


def test_roundtrip_token_fields():
    rng = np.random.default_rng(7)
    for la, sb in [(15, 4095), (16, 17), (255, 65535), (2, 3), (7, 1)]:
        p = spec.Params(la=la, sb=sb)
        T = 257
        off = rng.integers(0, p.d_limit + 1, T)
        ln = rng.integers(0, p.len_limit + 1, T)
        nxt = rng.integers(0, 256, T)
        stream = bitio.build_stream(off, ln, nxt, p)
        assert len(stream) == spec.stream_size_bytes(T, p.width)
        p2, off2, ln2, nxt2 = bitio.parse_stream(stream)
        assert (p2.la, p2.sb) == (la, sb)
        np.testing.assert_array_equal(off, off2)
        np.testing.assert_array_equal(ln, ln2)
        np.testing.assert_array_equal(nxt, nxt2)


def test_token_count_eof_rule():
    # Trailing sub-token bits are padding, never a phantom token.
    assert spec.token_count(0, 24) == 0
    assert spec.token_count(3, 24) == 1
    assert spec.token_count(4, 24) == 1
    assert spec.token_count(5, 24) == 1
    assert spec.token_count(6, 24) == 2
    assert spec.token_count(3, 23) == 1
