"""Bit-plane matcher tests: XLA formulation + Pallas port (interpret mode).

Both must be bit-exact with the brute distance sweep — including the
smallest-offset tie-break, which the bit-plane design realises via
first-touch distance-bit recording (ops/bitplane.py docstring).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lz77_tpu import spec
from lz77_tpu.ops import bitplane, match as match_ops, pallas_bitplane

from conftest import make_text


def _case(rng, la, sb, B, alpha, avail_frac=1.0, vx_frac=None):
    p = spec.Params(la=la, sb=sb)
    H, R = p.d_limit, p.len_limit
    x = rng.integers(0, alpha, B, dtype=np.uint8)
    halo = rng.integers(0, alpha, H, dtype=np.uint8)
    right = rng.integers(0, alpha, R, dtype=np.uint8)
    avail = int(H * avail_frac)
    valid_ext = B + R if vx_frac is None else int(B * vx_frac)
    return (
        jnp.asarray(x), jnp.asarray(halo), jnp.asarray(right),
        jnp.int32(avail), jnp.int32(valid_ext),
    )


@pytest.mark.parametrize(
    "la,sb,B,alpha",
    [
        (15, 4095, 4096, 4),     # runs-heavy: long matches everywhere
        (15, 4095, 4096, 200),   # sparse matches
        (8, 63, 512, 3),
        (3, 5, 256, 2),
        (33, 1023, 1024, 5),     # la at the old one-stripe cap
        (40, 127, 1024, 4),      # la past the old cap (r3: cap removed;
                                 # la=64 covered by the CLI routing test)
        (2, 65535, 2048, 3),     # full 16-bit distance planes
    ],
)
def test_bitplane_matches_brute(la, sb, B, alpha, rng):
    for avail_frac, vx in [(1.0, None), (0.0, None), (0.3, 0.7)]:
        args = _case(rng, la, sb, B, alpha, avail_frac, vx)
        L0, O0 = jax.jit(
            functools.partial(match_ops.find_matches_brute, la=la, sb=sb)
        )(*args)
        L1, O1 = jax.jit(
            functools.partial(bitplane.find_matches_bitplane, la=la, sb=sb)
        )(*args)
        np.testing.assert_array_equal(np.asarray(L0), np.asarray(L1))
        np.testing.assert_array_equal(np.asarray(O0), np.asarray(O1))


@pytest.mark.parametrize("la,sb,B,alpha,n_shards", [
    (15, 4095, 4096, 4, 2),
    (15, 4095, 4096, 200, 4),
    (8, 255, 1024, 3, 3),
])
def test_bitplane_range_combines_to_full(la, sb, B, alpha, n_shards, rng):
    """Sharded distance sub-ranges combined with combine_key/pmax semantics
    equal the full sweep — the window-axis contract (VERDICT r2 weak #7:
    the win axis now runs the bit-plane formulation, not brute)."""
    p = spec.Params(la=la, sb=sb)
    dlim = p.d_limit
    for avail_frac, vx in [(1.0, None), (0.3, 0.7)]:
        args = _case(rng, la, sb, B, alpha, avail_frac, vx)
        L0, O0 = jax.jit(
            functools.partial(bitplane.find_matches_bitplane, la=la, sb=sb)
        )(*args)
        per = -(-(-(-max(dlim, 1) // n_shards)) // 32) * 32
        key = None
        fn = jax.jit(functools.partial(
            bitplane.find_matches_bitplane_range, la=la, sb=sb, span=per
        ))
        for w in range(n_shards):
            d_lo = jnp.int32(1 + w * per)
            d_hi = jnp.int32(min(dlim + 1, 1 + (w + 1) * per))
            Lw, Ow = fn(*args, d_lo, d_hi)
            kw = match_ops.combine_key(Lw, Ow, dlim)
            key = kw if key is None else jnp.maximum(key, kw)
        L1, O1 = match_ops.split_key(key, dlim)
        np.testing.assert_array_equal(np.asarray(L0), np.asarray(L1))
        np.testing.assert_array_equal(np.asarray(O0), np.asarray(O1))


def test_bitplane_pallas_interpret_matches_brute(rng):
    # geometry large enough for the column-major kernel's row shifts
    la, sb, B = 4, 255, 16384
    args = _case(rng, la, sb, B, 3)
    L0, O0 = jax.jit(
        functools.partial(match_ops.find_matches_brute, la=la, sb=sb)
    )(*args)
    L1, O1 = pallas_bitplane.find_matches_bitplane_pallas(
        *args, la=la, sb=sb, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(L0), np.asarray(L1))
    np.testing.assert_array_equal(np.asarray(O0), np.asarray(O1))


def test_bitplane_pallas_small_block_fallback(rng):
    # rr <= depth delegates to the XLA bit-plane; results stay exact
    la, sb, B = 15, 255, 1024
    args = _case(rng, la, sb, B, 5)
    L0, O0 = match_ops.find_matches_brute(*args, la=la, sb=sb)
    L1, O1 = pallas_bitplane.find_matches_bitplane_pallas(
        *args, la=la, sb=sb, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(L0), np.asarray(L1))
    np.testing.assert_array_equal(np.asarray(O0), np.asarray(O1))


def test_bitplane_text_encode_stream_identical(rng):
    """End to end: bitplane matcher streams == chunked matcher streams."""
    from lz77_tpu.models import codec

    data = make_text(rng, 3 << 16)
    s_bit = codec.encode_bytes(
        data, block_size=1 << 14, batch_blocks=2, matcher="bitplane"
    )
    s_chk = codec.encode_bytes(
        data, block_size=1 << 14, batch_blocks=2, matcher="chunked"
    )
    assert s_bit == s_chk
    assert codec.decode_bytes(s_bit) == data


def test_preferred_block_size_geometry():
    """Tile-exact geometry: rr multiple of 8, rr > depth, even B."""
    for la, sb in [(15, 4095), (2, 65535), (33, 1023), (255, 4095), (15, 2)]:
        B = pallas_bitplane.preferred_block_size(la, sb)
        assert B > 0 and B % 2 == 0
        depth = spec.len_limit(la)
        n_real = spec.d_limit(sb) + B + depth
        nw = -(-n_real // 32)
        nw += (-nw) % 128
        rr = nw // 128
        assert rr % 8 == 0
        assert rr > depth
    # defaults fill the 32-row grid exactly
    assert pallas_bitplane.preferred_block_size() == 32 * 4096 - 4110
