"""Token-replay decode as a TPU scalar-core Pallas kernel.

The reference decoder (lz77.c:164-195) is byte-serial pointer chasing:
``buffer[back] = buffer[back - off]`` one byte at a time, where the source
byte may itself have been produced by the same token (overlapping copies).
TPU vector units have no gather hardware, so the XLA formulation
(ops/decode.py pointer-doubling) pays two orders of magnitude in
take_along_axis latency.  Like the parse (ops/parse_walk.py), the TPU-native
answer is the TensorCore's *scalar* unit: walk the token list directly,
replaying bytes through a power-of-two ring buffer in SMEM.

Layout:

* Tokens arrive pre-packed one int32 word each (``off | len<<16 | next<<24``
  — the same wire layout the fused encoder emits), staged into SMEM by the
  grid pipeline as (1, ROWS, tchunk) blocks.
* Decoded bytes live one per int32 word in a ring of ``RB = 2^(off_bits+1)``
  words of SMEM scratch, indexed ``p & (RB-1)``.  ``RB >= 2*max_off`` makes
  slot reuse safe: the position a slot held previously (``p - RB``) is
  always older than the furthest reachable match source (``p - max_off``).
* The copy loop takes one branch per token on the overlap class (the native
  decoder's off/len split, lz77host.cpp:578-584): ``off >= 4`` runs
  GROUP-wide *wildcopy* steps (all loads issued before any store so the
  scalar unit can pipeline them; up to GROUP-1 bytes of overshoot past the
  token end land on future positions that are rewritten, in order, before
  anything reads them); ``off == 1`` — the RLE-on-runs workhorse — splats
  one loaded byte with store-only groups; ``off in {2, 3}`` replays
  byte-serially with predicated pairs.
* Completed TILE-word output tiles DMA from the ring to HBM with
  ``pl.multiple_of``-aligned async copies (the ring size is a multiple of
  TILE, so a tile's positions are contiguous ring words).  The write cursor
  and flush cursor persist in SMEM scratch across grid steps, so the output
  is the exact serial byte stream.
* The host computes the exact output length up front (sum(len) + T — token
  widths are fixed, SURVEY.md §2.3.2), so the kernel never over-fetches.

Supported window: ``off_bits <= MAX_OFF_BITS = 16`` — the full reference
CLI range (sb <= 65535, main.c:37).  The widest ring is 2^17 int32 words =
512 KiB of SMEM scratch, verified in-budget on v5e hardware alongside the
64 KiB token staging block; anything wider (no valid header produces it)
falls back to the host decoder.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024        # int32 HBM tiling: DMA offsets must be TILE-aligned
ROWS = 8           # token sub-chunks per grid step
DEFAULT_TCHUNK = 2048
MAX_OFF_BITS = 16  # ring = 2^(off_bits+1) int32 words of SMEM (<= 512 KiB)
GROUP = 4          # independent copy slots per fast-path step (off >= GROUP)


def _kernel(scal_ref, tok_ref, out_ref, cnt_ref, ring, st, sem,
            *, ng, tchunk, rb):
    gidx = pl.program_id(0)
    T = scal_ref[0]
    mask = rb - 1

    @pl.when(gidx == 0)
    def _():
        st[0] = 0  # p: output byte cursor
        st[1] = 0  # fl: next output tile to flush

    def flush(k):
        src0 = pl.multiple_of((k * TILE) & mask, TILE)
        dst0 = pl.multiple_of(k * TILE, TILE)
        dma = pltpu.make_async_copy(
            ring.at[pl.ds(src0, TILE)], out_ref.at[pl.ds(dst0, TILE)], sem
        )
        dma.start()
        dma.wait()
        return k + 1

    def sub(r, carry):
        p0, fl0 = carry
        base = (gidx * ROWS + r) * tchunk
        end = jnp.minimum(tchunk, T - base)

        def cond(s):
            i, _, _ = s
            return i < end

        def body(s):
            i, p, fl = s
            w = tok_ref[0, r, i]
            off = w & 0xFFFF
            ln = lax.shift_right_logical(w, 16) & 0xFF
            nxt = lax.shift_right_logical(w, 24)
            qe = p + ln

            # ---- copy: one branch per token on the overlap class, the
            # same off/len split the native decoder uses
            # (lz77host.cpp:578-584).
            def fast(_):
                # off >= GROUP: GROUP-wide wildcopy steps, software-
                # pipelined (all loads issued before any store, legal
                # because sources sit >= GROUP behind the destination
                # group).  Overshoot of up to GROUP-1 bytes past the token
                # end is safe: overshoot bytes land on FUTURE positions,
                # each rewritten in order (by the next token's copies or
                # literal) before anything reads it, and tiles only flush
                # up to p so overshoot never reaches HBM early.
                def g(c):
                    q1, s1 = c
                    vs = [ring[(s1 + k) & mask] for k in range(GROUP)]
                    for k in range(GROUP):
                        ring[(q1 + k) & mask] = vs[k]
                    return q1 + GROUP, s1 + GROUP

                lax.while_loop(lambda c: c[0] < qe, g, (p, p - off))
                return 0

            def splat(_):
                # off == 1: the copy replicates ONE byte (the reference's
                # RLE-on-runs workhorse, lz77.c:178-188 with off=1) —
                # load once, then store-only wildcopy groups.
                v = ring[(p - 1) & mask]

                def g(q1):
                    ring[q1 & mask] = v
                    ring[(q1 + 1) & mask] = v
                    ring[(q1 + 2) & mask] = v
                    ring[(q1 + 3) & mask] = v
                    return q1 + 4

                lax.while_loop(lambda q1: q1 < qe, g, p)
                return 0

            def slow(_):
                # off in {2, 3}: overlapping copy, byte-serial (predicated
                # pair: an exhausted slot idempotently rewrites the frozen
                # position and stops advancing).  off==0 (pure literal)
                # never enters (ln==0); a malformed off=0,ln>0 token
                # self-copies garbage but terminates, like the host
                # decoders.
                def cb(q1):
                    for _ in range(2):
                        ring[q1 & mask] = ring[(q1 - off) & mask]
                        q1 = q1 + jnp.where(q1 < qe, 1, 0)
                    return q1

                lax.while_loop(lambda q1: q1 < qe, cb, p)
                return 0

            lax.cond(
                off >= GROUP, fast,
                lambda a: lax.cond(off == 1, splat, slow, a), 0,
            )
            ring[qe & mask] = nxt
            p = qe + 1

            # flush every completed tile (a token can cross at most one
            # TILE boundary per ~255 bytes, but runs of tokens can cross
            # several between checks — loop until caught up)
            fl = lax.while_loop(lambda k: k < p // TILE, flush, fl)
            return i + 1, p, fl

        _, p, fl = lax.while_loop(cond, body, (0, p0, fl0))
        return p, fl

    p, fl = lax.fori_loop(0, ROWS, sub, (st[0], st[1]))
    st[0] = p
    st[1] = fl

    @pl.when(gidx == ng - 1)
    def _():
        lax.cond(p % TILE != 0, flush, lambda k: k, fl)
        cnt_ref[0] = p


def decode_geometry(T: int, tchunk: int = DEFAULT_TCHUNK):
    """(nt, ng) for a stream of T tokens."""
    nt = -(-max(T, 1) // (tchunk * ROWS)) * ROWS
    ng = nt // ROWS
    return nt, ng


@functools.partial(
    jax.jit,
    static_argnames=("ng", "tchunk", "off_bits", "out_cap", "interpret"),
)
def walk_decode(
    toks3d: jnp.ndarray,  # (ng, ROWS, tchunk) int32 packed tokens
    total: jnp.ndarray,   # scalar int32: real token count T
    *,
    ng: int,
    tchunk: int,
    off_bits: int,
    out_cap: int,         # TILE-multiple >= sum(len) + T
    interpret: bool = False,
):
    """Replay tokens -> (bytes_i32, out_len).

    ``bytes_i32`` is (out_cap,) int32 with one decoded byte per word in the
    first ``out_len`` entries (cast to uint8 on the way out by the caller —
    a pure elementwise op, no gathers).
    """
    if off_bits > MAX_OFF_BITS:
        raise ValueError(
            f"walk decode supports off_bits <= {MAX_OFF_BITS}, got {off_bits}"
        )
    rb = max(2 * TILE, 1 << (off_bits + 1))
    kf = functools.partial(_kernel, ng=ng, tchunk=tchunk, rb=rb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ng,),
        in_specs=[
            pl.BlockSpec((1, ROWS, tchunk), lambda c, *_: (c, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.SMEM((rb,), jnp.int32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    scal = jnp.asarray(total, jnp.int32)[None]
    out, cnt = pl.pallas_call(
        kf,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((out_cap,), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ],
        interpret=interpret,
    )(scal, toks3d)
    return out, cnt[0]


def stage_tokens(
    off: np.ndarray, ln: np.ndarray, nxt: np.ndarray,
    tchunk: int = DEFAULT_TCHUNK,
):
    """Host-side staging: token fields -> (ng, ROWS, tchunk) packed words.

    Padding tokens are all-zero; the kernel's T bound keeps them inert.
    """
    T = off.shape[0]
    nt, ng = decode_geometry(T, tchunk)
    w = np.zeros((nt * tchunk,), np.int32)
    w[:T] = (
        off.astype(np.int64)
        | (ln.astype(np.int64) << 16)
        | (nxt.astype(np.int64) << 24)
    ).astype(np.int32)
    return w.reshape(ng, ROWS, tchunk), ng


def decode_tokens_walk(
    off: np.ndarray, ln: np.ndarray, nxt: np.ndarray,
    *,
    off_bits: int,
    tchunk: int = DEFAULT_TCHUNK,
    interpret: bool = False,
) -> bytes:
    """Decode a full token list on device via the walk kernel."""
    T = int(off.shape[0])
    if T == 0:
        return b""
    toks3d, ng = stage_tokens(off, ln, nxt, tchunk)
    out_len = int(ln.sum()) + T
    out_cap = (-(-(out_len + 1) // TILE)) * TILE
    out, cnt = walk_decode(
        jnp.asarray(toks3d), jnp.int32(T),
        ng=ng, tchunk=tchunk, off_bits=off_bits, out_cap=out_cap,
        interpret=interpret,
    )
    b = np.asarray(out[:out_cap].astype(jnp.uint8))
    n = int(cnt)
    assert n == out_len, (n, out_len)
    return b[:n].tobytes()
