"""Merged sweep+walk kernel (ops/fused_walk.py), interpret mode.

The kernel must emit the exact serial token stream: payloads assembled
across batches (entry carried as a device scalar) are compared
byte-for-byte against the host-parse pipeline for every input class the
walk touches differently (text, runs/early-exit, random, ragged tails,
tiny inputs, deep lookahead).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from lz77_tpu import bitio, spec
from lz77_tpu.models import codec
from lz77_tpu.ops import fused_walk

from conftest import make_text


def _encode_merged(data: bytes, params: spec.Params, B: int, G: int) -> bytes:
    x = np.frombuffer(data, np.uint8)
    n = x.shape[0]
    H, R = params.d_limit, params.len_limit
    nblocks = -(-n // B)
    parts = [bitio.header_bytes(params)]
    entry = jnp.int32(0)
    nb = params.width // 8
    for bi in range(-(-nblocks // G)):
        g0 = bi * G
        gn = min(G, nblocks - g0)
        gb, gh, gr, ga, gv = codec._batch_inputs(x, n, g0, gn, G, B, H, R)
        vt = min(G * B, n - g0 * B)
        payload, _, tot, entry = fused_walk.encode_batch_sweepwalk(
            jnp.asarray(gb), jnp.asarray(gh), jnp.asarray(gr),
            jnp.asarray(ga), jnp.asarray(gv), jnp.int32(vt), entry,
            la=params.la, sb=params.sb, interpret=True,
        )
        parts.append(np.asarray(payload)[: int(tot) * nb].tobytes())
    return b"".join(parts)


@pytest.fixture(scope="module")
def mixed(rng):
    return (
        make_text(rng, 20_000)
        + b"\x00" * 5_000
        + np.asarray(rng.integers(0, 256, 3_000, dtype=np.uint8)).tobytes()
    )


@pytest.mark.parametrize(
    "la,sb",
    [(5, 31), (9, 15)]
    + ([(15, 4095)] if os.environ.get("LZ77_HEAVY_TESTS") else []),
)
def test_merged_stream_identity(mixed, la, sb):
    # Interpret-mode geometries keep depth small: XLA CPU segfaults
    # compiling the kernel's unrolled body at depth=14 (la=15), so la=15
    # coverage is hardware-only (the bench's merged-kernel identity row
    # runs (15, 4095) on the real chip every round); (15, 4095) interpret
    # stays opt-in for big machines.
    p = spec.Params(la=la, sb=sb)
    B, G = 8192, 2
    if fused_walk.geometry(la, sb, B, p.d_limit, p.len_limit) is None:
        pytest.skip("geometry unsupported at this size")
    s = _encode_merged(mixed, p, B, G)
    assert s == codec.encode_bytes(mixed, p, block_size=B, batch_blocks=G)
    assert codec.decode_bytes(s) == mixed


def test_merged_ragged_and_tiny(mixed):
    p = spec.Params(la=5, sb=31)
    for n in (100, 1, 0, 9_000, 20_000):
        data = mixed[:n]
        s = _encode_merged(data, p, 8192, 2)
        assert s == codec.encode_bytes(data, p, block_size=8192,
                                       batch_blocks=2), n


def test_merged_runs_early_exit():
    """Zeros saturate the sweep's early exit after a handful of windows;
    the walk must still drain the full block."""
    p = spec.Params(la=5, sb=31)
    data = b"\x00" * 24_000
    s = _encode_merged(data, p, 8192, 2)
    assert s == codec.encode_bytes(data, p, block_size=8192, batch_blocks=2)
    assert codec.decode_bytes(s) == data


def test_merged_entry_carry_across_batches(rng):
    """Multi-batch: the exit overhang must chain as the next batch's entry
    (runs make every block boundary land mid-token)."""
    p = spec.Params(la=9, sb=15)
    data = b"ab" * 2_000 + b"\x00" * 12_000 + make_text(rng, 12_000)
    s = _encode_merged(data, p, 8192, 1)  # 1 block/batch: max carries
    assert s == codec.encode_bytes(data, p, block_size=8192, batch_blocks=1)


def test_geometry_gates():
    # non-power-of-two-friendly and oversized shapes must decline
    assert fused_walk.geometry(15, 4095, 126963, 4095, 14) is not None
    assert fused_walk.geometry(15, 4095, 126963, 100, 14) is None  # H != dlim
    assert fused_walk.geometry(64, 65535, 1 << 20, 65535, 63) is None  # VMEM
