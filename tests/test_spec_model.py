"""Differential tests: numpy executable spec vs the C reference oracle.

Three-way contract (SURVEY.md §4):
  * our-encode -> C-decode == original   (streams we emit are C-decodable)
  * C-encode -> our-decode == original   (we decode anything C emits)
  * our-encode size <= C-encode size     (true-longest-match dominance)
"""

import numpy as np
import pytest

from lz77_tpu import spec
from lz77_tpu.models import spec_np

from conftest import CORPUS_SMALL


@pytest.mark.parametrize("name", CORPUS_SMALL)
def test_self_roundtrip(name, rng):
    data = CORPUS_SMALL[name](rng)
    stream = spec_np.encode(data)
    assert spec_np.decode(stream) == data


@pytest.mark.parametrize("name", CORPUS_SMALL)
def test_encode_is_c_decodable(name, rng, oracle):
    data = CORPUS_SMALL[name](rng)
    stream = spec_np.encode(data)
    assert oracle.decode(stream) == data


@pytest.mark.parametrize("name", CORPUS_SMALL)
def test_decode_of_c_streams(name, rng, oracle):
    data = CORPUS_SMALL[name](rng)
    stream = oracle.encode(data)
    assert spec_np.decode(stream) == data


@pytest.mark.parametrize("name", CORPUS_SMALL)
def test_size_beats_or_matches_reference(name, rng, oracle):
    data = CORPUS_SMALL[name](rng)
    ours = spec_np.encode(data)
    ref = oracle.encode(data)
    assert len(ours) <= len(ref)


@pytest.mark.parametrize(
    "la,sb",
    [(2, 3), (15, 255), (16, 1023), (17, 1025), (32, 4093), (255, 4095)],
)
def test_param_sweep_vs_oracle(la, sb, rng, oracle):
    data = CORPUS_SMALL["text"](rng)[:1500]
    p = spec.Params(la=la, sb=sb)
    ours = spec_np.encode(data, p)
    assert oracle.decode(ours) == data
    ref = oracle.encode(data, la=la, sb=sb)
    assert spec_np.decode(ref) == data
    assert len(ours) <= len(ref)


@pytest.mark.parametrize("sb", [1, 2, 4, 1024])
def test_degenerate_sb_safe_where_reference_corrupts(sb, rng):
    """Power-of-two sb corrupts in the reference; we emit valid streams."""
    data = CORPUS_SMALL["runs"](rng)[:800]
    p = spec.Params(la=15, sb=sb)
    stream = spec_np.encode(data, p)
    assert spec_np.decode(stream) == data


def test_empty_input_is_four_byte_stream():
    stream = spec_np.encode(b"")
    assert len(stream) == 4
    assert spec_np.decode(stream) == b""


def test_overlapping_copy_runs():
    # off < len self-reference: 'aaaa...' must emit maximal-length tokens.
    data = b"a" * 100
    stream = spec_np.encode(data)
    assert spec_np.decode(stream) == data
    # Format floor: after the first literal, every token covers 15 bytes.
    _, off, ln, _ = __import__(
        "lz77_tpu.bitio", fromlist=["parse_stream"]
    ).parse_stream(stream)
    assert ln[0] == 0
    assert (ln[1:-1] == 14).all()
    assert (off[1:] == 1).all()  # nearest-offset tie-break
