"""Device-resident fused encode pipeline (models/fused.py).

The fused step keeps match -> parse -> gather -> pack on device and must emit
streams byte-identical to the host-parse pipeline (and therefore to the numpy
executable spec and the <= reference-size guarantee chain).
"""

import numpy as np
import pytest

from lz77_tpu import spec
from lz77_tpu.models import codec, fused

from conftest import CORPUS_SMALL, make_text


@pytest.mark.parametrize("name", sorted(CORPUS_SMALL))
def test_fused_matches_host_pipeline(rng, name):
    data = CORPUS_SMALL[name](rng)
    params = spec.Params()
    out = fused.encode_bytes_fused(
        data, params, block_size=2048, batch_blocks=2, matcher="brute",
        sub_block=256,
    )
    ref = codec.encode_bytes(data, params, block_size=2048, matcher="brute")
    assert out == ref
    assert codec.decode_bytes(out) == data


def test_fused_odd_geometry(rng):
    """Block size not a multiple of the sub-block: the batch span's ragged
    tail exercises the valid-boundary rebase of the entry maps."""
    data = make_text(rng, 50000)
    params = spec.Params()
    out = fused.encode_bytes_fused(
        data, params, block_size=10002, batch_blocks=3, matcher="chunked",
        sub_block=512,
    )
    ref = codec.encode_bytes(data, params, block_size=10002, matcher="chunked")
    assert out == ref


def test_fused_entry_carry_across_batches(rng):
    """A long run straddling several batch boundaries forces nonzero entry
    offsets carried device-side between batches."""
    data = b"x" * 9000 + make_text(rng, 3000) + b"y" * 9000
    params = spec.Params()
    out = fused.encode_bytes_fused(
        data, params, block_size=2048, batch_blocks=2, matcher="chunked",
        sub_block=256,
    )
    ref = codec.encode_bytes(data, params, block_size=2048, matcher="chunked")
    assert out == ref


def test_fused_nondefault_aligned_params(rng):
    """la=16, sb=4095 -> 12+4+8 = 24-bit tokens (byte-aligned, non-default)."""
    data = make_text(rng, 20000)
    params = spec.Params(la=16, sb=4095)
    out = fused.encode_bytes_fused(
        data, params, block_size=4096, batch_blocks=2, matcher="chunked",
        sub_block=512,
    )
    ref = codec.encode_bytes(data, params, block_size=4096, matcher="chunked")
    assert out == ref


def test_fused_rejects_unaligned_width():
    params = spec.Params(la=17, sb=4095)  # 12+5+8 = 25 bits
    with pytest.raises(ValueError, match="byte-aligned"):
        fused.encode_bytes_fused(b"abc", params)


def test_fused_cross_decode_oracle(oracle, rng):
    data = make_text(rng, 30000)
    out = fused.encode_bytes_fused(
        data, spec.Params(), block_size=4096, batch_blocks=2,
        matcher="chunked", sub_block=512,
    )
    assert oracle.decode(out) == data
    ref = oracle.encode(data)
    assert len(out) <= len(ref)


def test_fused_stats(rng):
    data = make_text(rng, 20000)
    st = codec.EncodeStats()
    out = fused.encode_bytes_fused(
        data, spec.Params(), block_size=4096, batch_blocks=2,
        matcher="chunked", sub_block=512, stats=st,
    )
    assert st.input_bytes == len(data)
    assert st.output_bytes == len(out)
    assert st.tokens == (len(out) - 4) // 3  # 24-bit tokens
    assert st.blocks == -(-len(data) // 4096)
    assert st.phases.total > 0


def test_walk_parser_matches_scan(rng):
    """The scalar-core walk kernel (interpret mode on CPU) must produce the
    exact token stream of the XLA scan formulation."""
    import jax.numpy as jnp

    from lz77_tpu.models import codec as codec_model

    data = make_text(rng, 40000) + b"\x00" * 5000
    params = spec.Params()
    x = np.frombuffer(data, np.uint8)
    n = x.shape[0]
    B, G = 8192, 3
    H, R = params.d_limit, params.len_limit
    entry_w = jnp.int32(0)
    entry_s = jnp.int32(0)
    nblocks = -(-n // B)
    out_w, out_s = [], []
    for bi in range(-(-nblocks // G)):
        g0 = bi * G
        gn = min(G, nblocks - g0)
        gb, gh, gr, ga, gv = codec_model._batch_inputs(x, n, g0, gn, G, B, H, R)
        vt = jnp.int32(min(G * B, n - g0 * B))
        args = (jnp.asarray(gb), jnp.asarray(gh), jnp.asarray(gr),
                jnp.asarray(ga), jnp.asarray(gv), vt)
        pw, _, tw, entry_w = fused.encode_batch_walk(
            *args, entry_w, la=params.la, sb=params.sb, matcher="chunked",
            sub_block=1024, interpret=True,
        )
        ps, _, ts, entry_s = fused.encode_batch_device(
            *args, entry_s, la=params.la, sb=params.sb, matcher="chunked",
            sub_block=1024,
        )
        tw, ts = int(tw), int(ts)
        assert tw == ts
        out_w.append(np.asarray(pw)[: tw * 3])
        out_s.append(np.asarray(ps)[: ts * 3])
        assert int(entry_w) == int(entry_s)
    assert all(np.array_equal(a, b) for a, b in zip(out_w, out_s))


def test_fused_deep_la_scan_parser(rng):
    """la > 128 (beyond the walk parser's range) routes to the scan parser
    and stays byte-identical — including the widest 32-bit token layout."""
    data = make_text(rng, 100_000) + b"\x00" * 10_000
    for p in (spec.Params(la=255, sb=255), spec.Params(la=129, sb=65535)):
        ref = codec.encode_bytes(data, p, block_size=16384, batch_blocks=4)
        s = fused.encode_bytes_fused(
            data, p, block_size=16384, batch_blocks=4, matcher="chunked"
        )
        assert s == ref
        assert codec.decode_bytes(s) == data
