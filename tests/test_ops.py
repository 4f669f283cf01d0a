"""Unit tests for device ops against the numpy executable spec."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lz77_tpu import spec
from lz77_tpu.models import codec, spec_np
from lz77_tpu.ops import decode as decode_ops
from lz77_tpu.ops import match as match_ops
from lz77_tpu.ops import parse as parse_ops

from conftest import CORPUS_SMALL, make_text


def _ref_matches(x: np.ndarray, start: int, end: int, p: spec.Params):
    """Spec-model longest match per position over the global input."""
    L = np.zeros(end - start, np.int64)
    O = np.zeros(end - start, np.int64)
    n = x.shape[0]
    for i, pos in enumerate(range(start, end)):
        cap = min(p.len_limit, n - pos - 1)
        dmax = min(p.d_limit, pos)
        L[i], O[i] = spec_np.find_longest_match(x, pos, cap, dmax)
    return L, O


def _block_inputs(x: np.ndarray, start: int, B: int, p: spec.Params):
    """Slice block/halo/right/avail/valid_ext for a block at ``start``."""
    n = x.shape[0]
    H, R = p.d_limit, p.len_limit
    block = np.zeros(B, np.uint8)
    seg = x[start : min(start + B, n)]
    block[: seg.shape[0]] = seg
    halo = np.zeros(H, np.uint8)
    a = min(H, start)
    if a:
        halo[H - a :] = x[start - a : start]
    right = np.zeros(R, np.uint8)
    rseg = x[start + B : min(start + B + R, n)]
    right[: rseg.shape[0]] = rseg
    return (
        jnp.asarray(block), jnp.asarray(halo), jnp.asarray(right),
        jnp.int32(a), jnp.int32(min(B + R, n - start)),
    )


@pytest.mark.parametrize("matcher", sorted(match_ops.MATCHERS))
@pytest.mark.parametrize("la,sb", [(15, 100), (15, 1025), (4, 7), (17, 33)])
def test_matchers_against_spec(matcher, la, sb, rng):
    p = spec.Params(la=la, sb=sb)
    data = make_text(rng, 700) + bytes(rng.integers(0, 4, 300, dtype=np.uint8))
    x = np.frombuffer(data, np.uint8)
    n = x.shape[0]
    find = jax.jit(
        match_ops.get_matcher(matcher), static_argnames=("la", "sb")
    )
    L, O = find(*_block_inputs(x, 0, n, p), la=la, sb=sb)
    Lr, Or = _ref_matches(x, 0, n, p)
    np.testing.assert_array_equal(np.asarray(L), Lr)
    np.testing.assert_array_equal(np.asarray(O), Or)


@pytest.mark.parametrize("matcher", sorted(match_ops.MATCHERS))
def test_matchers_block_invariance(matcher, rng):
    """A mid-stream block with halo + right ext must reproduce the global
    per-position answers exactly (foundation of the size guarantee)."""
    p = spec.Params(la=15, sb=255)
    data = make_text(rng, 1200)
    x = np.frombuffer(data, np.uint8)
    B, start = 512, 512
    find = jax.jit(
        match_ops.get_matcher(matcher), static_argnames=("la", "sb")
    )
    L, O = find(*_block_inputs(x, start, B, p), la=15, sb=255)
    end = min(start + B, x.shape[0])
    Lr, Or = _ref_matches(x, start, end, p)
    np.testing.assert_array_equal(np.asarray(L)[: end - start], Lr)
    np.testing.assert_array_equal(np.asarray(O)[: end - start], Or)


def test_matchers_agree(rng):
    p = spec.Params(la=15, sb=4095)
    data = CORPUS_SMALL["runs"](rng)
    x = np.frombuffer(data, np.uint8)
    args = _block_inputs(x, 0, x.shape[0], p)
    L1, O1 = jax.jit(
        match_ops.find_matches_brute, static_argnames=("la", "sb")
    )(*args, la=15, sb=4095)
    L2, O2 = jax.jit(
        match_ops.find_matches_sorted, static_argnames=("la", "sb")
    )(*args, la=15, sb=4095)
    np.testing.assert_array_equal(np.asarray(L1), np.asarray(L2))
    np.testing.assert_array_equal(np.asarray(O1), np.asarray(O2))


def test_greedy_parse_matches_serial():
    L = jnp.asarray(np.array([3, 0, 0, 0, 2, 1, 0, 0, 0, 0], np.int32))
    starts, count, exit_pos = parse_ops.greedy_parse(L, jnp.int32(10), la=15)
    # serial: 0 -> 4 -> 7 -> 8 -> 9 -> 10(end)
    assert int(count) == 5
    np.testing.assert_array_equal(np.asarray(starts)[:5], [0, 4, 7, 8, 9])
    assert int(exit_pos) == 10


def test_greedy_parse_entry_and_overhang():
    # L[8] = 3 -> token at 8 consumes through 11, overhanging a 10-limit
    # block by 2: exit must be 12, i.e. entry offset 2 for the next block.
    L = jnp.asarray(np.array([0, 0, 0, 0, 0, 0, 0, 0, 3, 0], np.int32))
    starts, count, exit_pos = parse_ops.greedy_parse(
        L, jnp.int32(10), jnp.int32(4), la=15
    )
    assert int(count) == 5  # 4,5,6,7,8
    np.testing.assert_array_equal(np.asarray(starts)[:5], [4, 5, 6, 7, 8])
    assert int(exit_pos) == 12


def test_greedy_parse_empty():
    starts, count, _ = parse_ops.greedy_parse(
        jnp.zeros(8, jnp.int32), jnp.int32(0), la=15
    )
    assert int(count) == 0


def test_host_parse_matches_device(rng):
    p = spec.Params(la=15, sb=255)
    data = make_text(rng, 900)
    x = np.frombuffer(data, np.uint8)
    args = _block_inputs(x, 0, x.shape[0], p)
    L, O = match_ops.find_matches_sorted(*args, la=15, sb=255)
    starts_d, count_d, exit_d = parse_ops.greedy_parse(
        L, jnp.int32(x.shape[0]), la=15
    )
    starts_h, exit_h = codec.parse_block_np(
        np.asarray(L), x.shape[0], 0, 15
    )
    assert int(count_d) == starts_h.shape[0]
    np.testing.assert_array_equal(
        np.asarray(starts_d)[: int(count_d)], starts_h
    )
    assert int(exit_d) == exit_h


def test_decode_tokens_matches_spec(rng):
    data = CORPUS_SMALL["runs"](rng)
    p = spec.Params()
    off, ln, nxt = spec_np.encode_tokens(data, p)
    T = off.shape[0]
    out, out_len = decode_ops.decode_tokens(
        jnp.asarray(off.astype(np.int32)),
        jnp.asarray(ln.astype(np.int32)),
        jnp.asarray(nxt.astype(np.int32)),
        jnp.int32(T),
        jnp.zeros(4095, jnp.uint8),
        la=15,
    )
    assert np.asarray(out)[: int(out_len)].tobytes() == data


def test_decode_tokens_chunked_with_tail(rng):
    """Chunk boundary with carried tail must reproduce serial decode."""
    data = CORPUS_SMALL["text"](rng)
    p = spec.Params()
    off, ln, nxt = spec_np.encode_tokens(data, p)
    off = off.astype(np.int32); ln = ln.astype(np.int32); nxt = nxt.astype(np.int32)
    T = off.shape[0]
    cut = T // 2
    H = 4095
    out1, n1 = decode_ops.decode_tokens(
        jnp.asarray(off[:cut]), jnp.asarray(ln[:cut]), jnp.asarray(nxt[:cut]),
        jnp.int32(cut), jnp.zeros(H, jnp.uint8), la=15,
    )
    o1 = np.asarray(out1)[: int(n1)]
    tail = np.zeros(H, np.uint8)
    tail[H - min(H, o1.shape[0]):] = o1[-min(H, o1.shape[0]):]
    out2, n2 = decode_ops.decode_tokens(
        jnp.asarray(off[cut:]), jnp.asarray(ln[cut:]), jnp.asarray(nxt[cut:]),
        jnp.int32(T - cut), jnp.asarray(tail), la=15,
    )
    o2 = np.asarray(out2)[: int(n2)]
    assert (o1.tobytes() + o2.tobytes()) == data
