"""Randomized differential fuzzing (SURVEY.md §4c property tests).

Random inputs x random valid parameters, cross-checked three ways on every
sample: native serial == native parallel == numpy executable spec, decoded
by both our decoder and the C oracle.  Bounded runtime: small inputs, fixed
seed, ~40 samples.
"""

import numpy as np
import pytest

from lz77_tpu import native, spec
from lz77_tpu.models import spec_np


def _random_params(rng) -> spec.Params:
    while True:
        la = int(rng.integers(spec.MIN_LA_SIZE, 64))
        sb = int(rng.integers(2, 5000))
        if not spec.is_degenerate_sb(sb):
            return spec.Params(la=la, sb=sb)


def _random_data(rng) -> bytes:
    kind = int(rng.integers(0, 5))
    n = int(rng.integers(0, 20_000))
    if kind == 0:  # uniform random
        return rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    if kind == 1:  # tiny alphabet (match-heavy)
        return rng.integers(0, 3, n, dtype=np.uint8).tobytes()
    if kind == 2:  # runs
        parts = []
        while sum(map(len, parts)) < n:
            parts.append(bytes([int(rng.integers(0, 4))])
                         * int(rng.integers(1, 400)))
        return b"".join(parts)[:n]
    if kind == 3:  # periodic
        period = int(rng.integers(1, 300))
        pat = rng.integers(0, 256, period, dtype=np.uint8).tobytes()
        return (pat * (n // period + 1))[:n]
    # text-ish
    from conftest import make_text

    return make_text(rng, n)


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_differential(seed, oracle):
    rng = np.random.default_rng(0xF0 + seed)
    for _ in range(10):
        p = _random_params(rng)
        data = _random_data(rng)
        s_serial = native.encode(data, p, threads=1)
        s_mt = native.encode(data, p, threads=2, block_size=1 << 13)
        assert s_mt == s_serial
        s_np = spec_np.encode(data, p)
        assert s_np == s_serial
        assert native.decode(s_serial) == data
        assert oracle.decode(s_serial) == data
        # C encoder's stream decodes identically through us, and our stream
        # is never larger (SURVEY.md §2.4 dominance argument).
        c_stream = oracle.encode(data, la=p.la, sb=p.sb)
        assert native.decode(c_stream) == data
        assert len(s_serial) <= len(c_stream)
        # streamed bounded-memory decoder, random chunk geometry: identical
        # bytes for both our stream and the C encoder's
        rc = int(rng.integers(1, 5000))
        oc = int(rng.integers(256, 3000))
        for stream in (s_serial, c_stream):
            got = bytearray()
            with native.DecodeStream(out_chunk=oc) as ds:
                for i in range(0, len(stream), rc):
                    for piece in ds.feed(stream[i : i + rc]):
                        got += piece.tobytes()
            assert bytes(got) == data
