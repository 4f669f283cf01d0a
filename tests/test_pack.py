"""Device pack/unpack op tests against the host bitio reference."""

import jax.numpy as jnp
import numpy as np
import pytest

from lz77_tpu import bitio, spec
from lz77_tpu.ops import pack as pack_ops


@pytest.mark.parametrize("la,sb", [(15, 4095), (15, 255), (17, 1025), (3, 5)])
def test_device_pack_matches_host(la, sb, rng):
    p = spec.Params(la=la, sb=sb)
    T = 513
    off = rng.integers(0, p.d_limit + 1, T)
    ln = rng.integers(0, p.len_limit + 1, T)
    nxt = rng.integers(0, 256, T)
    dev = np.asarray(
        pack_ops.pack_tokens_device(
            jnp.asarray(off), jnp.asarray(ln), jnp.asarray(nxt), p
        )
    )
    host_bits = bitio.tokens_to_bits(off, ln, nxt, p)
    host = np.packbits(host_bits, bitorder="little")
    np.testing.assert_array_equal(dev, host)


@pytest.mark.parametrize("la,sb", [(15, 4095), (17, 1025)])
def test_device_unpack_roundtrip(la, sb, rng):
    p = spec.Params(la=la, sb=sb)
    T = 257
    off = rng.integers(0, p.d_limit + 1, T)
    ln = rng.integers(0, p.len_limit + 1, T)
    nxt = rng.integers(0, 256, T)
    payload = pack_ops.pack_tokens_device(
        jnp.asarray(off), jnp.asarray(ln), jnp.asarray(nxt), p
    )
    o2, l2, n2 = pack_ops.unpack_tokens_device(payload, T, p)
    np.testing.assert_array_equal(np.asarray(o2), off)
    np.testing.assert_array_equal(np.asarray(l2), ln)
    np.testing.assert_array_equal(np.asarray(n2), nxt)


def test_native_phase_pack_equals_bit_reference():
    """lz77_pack_tokens_phase at every phase == the numpy bit model shifted
    by the phase (low bits of the first byte zero, final byte zero-padded).
    Replaces bitio.c:203-236 across block boundaries at any width."""
    from lz77_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(0xFA5E)
    for la, sb in ((9, 511), (15, 4095), (20, 1023), (255, 65535)):
        p = spec.Params(la=la, sb=sb)
        T = 97
        off = rng.integers(0, p.d_limit + 1, T).astype(np.int64)
        ln = rng.integers(0, p.len_limit + 1, T).astype(np.int64)
        nxt = rng.integers(0, 256, T).astype(np.int64)
        bits = bitio.tokens_to_bits(off, ln, nxt, p)  # (T*width,) 0/1
        for phase in range(8):
            buf, nbits = native.pack_tokens_phase(off, ln, nxt, p, phase)
            assert nbits == T * p.width
            padded = np.concatenate([
                np.zeros(phase, np.uint8), bits,
            ])
            expect = np.packbits(padded, bitorder="little")
            assert np.array_equal(buf, expect), (la, sb, phase)
