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


def _kernel(scal_ref, tok_ref, win_ref, out_ref, cnt_ref, ring, st, sem,
            *, ng, tchunk, rb, wp):
    gidx = pl.program_id(0)
    T = scal_ref[0]
    mask = rb - 1

    @pl.when(gidx == 0)
    def _():
        st[0] = 0  # p: output byte cursor
        st[1] = 0  # fl: next output tile to flush
        if wp:
            # Window priming for STREAMED decode: history bytes (the last
            # wp decoded positions of earlier chunks) land in the ring's
            # tail, i.e. at the slots of positions -wp..-1, so match
            # sources behind p=0 resolve exactly as if the whole stream
            # were one invocation.  Slot reuse stays safe for any wp <= rb:
            # the history byte a slot s holds (position s - rb) is rb > 
            # 2^off_bits positions behind the cursor when p reaches s.
            dma = pltpu.make_async_copy(
                win_ref.at[pl.ds(0, wp)],
                ring.at[pl.ds(pl.multiple_of(rb - wp, TILE), wp)], sem
            )
            dma.start()
            dma.wait()

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
    static_argnames=("ng", "tchunk", "off_bits", "out_cap", "interpret",
                     "wp"),
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
    win: jnp.ndarray | None = None,  # (wp,) int32 history bytes (streamed)
    wp: int = 0,
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
    if wp:
        if wp % TILE or wp > rb:
            raise ValueError("wp must be a TILE multiple <= ring size")
        if win is None or win.shape[0] != wp:
            raise ValueError("win must be a (wp,) int32 array")
    else:
        win = jnp.zeros((TILE,), jnp.int32)
    kf = functools.partial(_kernel, ng=ng, tchunk=tchunk, rb=rb, wp=wp)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ng,),
        in_specs=[
            pl.BlockSpec((1, ROWS, tchunk), lambda c, *_: (c, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
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
    )(scal, toks3d, win)
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


# ---------------------------------------------------------------------------
# Packed-ring variant: 4 decoded bytes per int32 ring word.
#
# The byte-per-word kernel's copy loop moves one byte per ring op; the
# packed layout moves four (funnel shift when the source offset is not
# word-aligned), at the price of read-modify-write blends at token
# boundaries.  Because writes advance strictly sequentially, the current
# (incomplete) output word lives in a register-like SMEM slot ``cw`` and
# the destination side never loads: a token's copy flushes ``cw``, blends
# its first word, wildcopies whole words (up to 3 bytes of overshoot onto
# future positions, rewritten before anything reads them), then reloads
# ``cw`` from the ring.  The ring shrinks 4x (2^(off_bits+1) BYTES = up to
# 32 K words = 128 KiB SMEM at sb=65535) and the HBM/host side moves packed
# bytes (no device-side int32->uint8 cast, 4x smaller fetch).
# Replays lz77.c:178-188's byte-serial loop at word granularity.
#
# MEASURED DEAD END on v5e (round 4, slope-timed, bit-exact before timing):
# text 82.8 MB/s vs the byte-ring's 94.6; runs 158.0 vs 158.9; sb=65535
# text 105.7 vs 113.2.  At la=15's ~5.3-byte average matches the copy is
# one blended first word + ~1 funnel word — no fewer ring ops than two
# 4-wide wildcopy groups — while the cw bookkeeping (flush, blend, reload,
# literal RMW) adds ~8 ops to the ~15-op/token fixed cost that already
# dominates (ROOFLINE.md).  Equal runs throughput despite 4x fewer stores
# confirms the kernel is fixed-cost-bound, not store-bound.  Kept in-tree
# (tested bit-exact in interpret mode) as the measured record; the
# byte-ring kernel remains the production decode backend.
# ---------------------------------------------------------------------------


def _kernel_packed(scal_ref, tok_ref, out_ref, cnt_ref, ring, st, sem,
                   *, ng, tchunk, rw):
    gidx = pl.program_id(0)
    T = scal_ref[0]
    wmask = rw - 1                      # ring WORD index mask
    i32 = jnp.int32

    @pl.when(gidx == 0)
    def _():
        st[0] = 0  # p: output BYTE cursor
        st[1] = 0  # fl: next output TILE (of int32 words) to flush
        st[2] = 0  # cw: current (incomplete) output word

    def flush(k):
        src0 = pl.multiple_of((k * TILE) & wmask, TILE)
        dst0 = pl.multiple_of(k * TILE, TILE)
        dma = pltpu.make_async_copy(
            ring.at[pl.ds(src0, TILE)], out_ref.at[pl.ds(dst0, TILE)], sem
        )
        dma.start()
        dma.wait()
        return k + 1

    def funnel(s):
        # the 4 decoded bytes starting at byte position s, packed LE
        sw = lax.shift_right_logical(s, 2)
        a = s & 3
        w0 = ring[sw & wmask]
        w1 = ring[(sw + 1) & wmask]
        lo = lax.shift_right_logical(w0, 8 * a)
        hi = w1 << (8 * ((4 - a) & 3))  # a==0 branch discards this
        return jnp.where(a == 0, w0, lo | hi)

    def sub(r, carry):
        p0, fl0, cw0 = carry
        base = (gidx * ROWS + r) * tchunk
        end = jnp.minimum(tchunk, T - base)

        def cond(sv):
            i, _, _, _ = sv
            return i < end

        def body(sv):
            i, p, fl, cw = sv
            w = tok_ref[0, r, i]
            off = w & 0xFFFF
            ln = lax.shift_right_logical(w, 16) & 0xFF
            nxt = lax.shift_right_logical(w, 24)
            qe = p + ln
            lane = p & 3
            wi = lax.shift_right_logical(p, 2)

            def copy_fast(cw):
                # off >= 4: flush cw, blend the first word, wildcopy whole
                # words (overshoot <= 3 bytes onto future positions), then
                # reload cw.  Sources always sit >= 4 bytes behind the
                # write cursor, so every funnel reads completed ring bytes
                # (the just-stored word included — strictly serial order).
                ring[wi & wmask] = cw
                s = p - off
                v0 = funnel(s)
                ring[wi & wmask] = cw | (v0 << (8 * lane))
                filled = 4 - lane

                def g(c):
                    p1, s1 = c
                    ring[lax.shift_right_logical(p1, 2) & wmask] = funnel(s1)
                    return p1 + 4, s1 + 4

                lax.while_loop(
                    lambda c: c[0] < qe, g, (p + filled, s + filled)
                )
                lane_e = qe & 3
                return (
                    ring[lax.shift_right_logical(qe, 2) & wmask]
                    & ((i32(1) << (8 * lane_e)) - 1)
                )

            def copy_splat(cw):
                # off == 1: replicate one byte (RLE-on-runs workhorse)
                pw = lax.shift_right_logical(p - 1, 2)
                src_w = jnp.where(lane > 0, cw, ring[pw & wmask])
                b = lax.shift_right_logical(src_w, 8 * ((p - 1) & 3)) & 0xFF
                bb = b * i32(0x01010101)
                ring[wi & wmask] = cw | (bb << (8 * lane))

                def g(p1):
                    ring[lax.shift_right_logical(p1, 2) & wmask] = bb
                    return p1 + 4

                lax.while_loop(lambda p1: p1 < qe, g, p + (4 - lane))
                lane_e = qe & 3
                return (
                    ring[lax.shift_right_logical(qe, 2) & wmask]
                    & ((i32(1) << (8 * lane_e)) - 1)
                )

            def copy_slow(cw):
                # off in {2, 3}: overlapping byte-serial replay through cw
                def g(c):
                    q1, cwq = c
                    sq = q1 - off
                    sw = lax.shift_right_logical(sq, 2)
                    qw = lax.shift_right_logical(q1, 2)
                    vw = jnp.where(sw == qw, cwq, ring[sw & wmask])
                    b = lax.shift_right_logical(vw, 8 * (sq & 3)) & 0xFF
                    lq = q1 & 3
                    cwq = cwq | (b << (8 * lq))
                    full = lq == 3
                    ring[qw & wmask] = cwq  # idempotent until word completes
                    return q1 + 1, jnp.where(full, 0, cwq)

                _, cwe = lax.while_loop(lambda c: c[0] < qe, g, (p, cw))
                return cwe

            cw = lax.cond(
                ln == 0,
                lambda c: c,
                lambda c: lax.cond(
                    off >= 4, copy_fast,
                    lambda c2: lax.cond(off == 1, copy_splat, copy_slow, c2),
                    c,
                ),
                cw,
            )

            # literal byte
            lane_q = qe & 3
            cw = cw | (nxt << (8 * lane_q))
            qw = lax.shift_right_logical(qe, 2)
            @pl.when(lane_q == 3)
            def _():
                ring[qw & wmask] = cw
            cw = jnp.where(lane_q == 3, 0, cw)
            p = qe + 1

            # flush completed word-tiles (words < p>>2 are final)
            fl = lax.while_loop(
                lambda k: k < lax.shift_right_logical(p, 2) // TILE, flush, fl
            )
            return i + 1, p, fl, cw

        _, p, fl, cw = lax.while_loop(cond, body, (0, p0, fl0, cw0))
        return p, fl, cw

    p, fl, cw = lax.fori_loop(0, ROWS, sub, (st[0], st[1], st[2]))
    st[0] = p
    st[1] = fl
    st[2] = cw

    @pl.when(gidx == ng - 1)
    def _():
        # store the final partial word, then flush the last partial tile
        @pl.when((p & 3) != 0)
        def _():
            ring[lax.shift_right_logical(p, 2) & wmask] = cw
        words = lax.shift_right_logical(p + 3, 2)
        lax.cond(fl * TILE < words, flush, lambda k: k, fl)
        cnt_ref[0] = p


@functools.partial(
    jax.jit,
    static_argnames=("ng", "tchunk", "off_bits", "out_cap_words", "interpret"),
)
def walk_decode_packed(
    toks3d: jnp.ndarray,  # (ng, ROWS, tchunk) int32 packed tokens
    total: jnp.ndarray,   # scalar int32: real token count T
    *,
    ng: int,
    tchunk: int,
    off_bits: int,
    out_cap_words: int,   # TILE-multiple >= ceil((sum(len)+T)/4)
    interpret: bool = False,
):
    """Replay tokens -> (packed_bytes_i32, out_len_bytes)."""
    if off_bits > MAX_OFF_BITS:
        raise ValueError(
            f"walk decode supports off_bits <= {MAX_OFF_BITS}, got {off_bits}"
        )
    rw = max(2 * TILE, (1 << (off_bits + 1)) // 4)
    kf = functools.partial(_kernel_packed, ng=ng, tchunk=tchunk, rw=rw)
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
            pltpu.SMEM((rw,), jnp.int32),
            pltpu.SMEM((3,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    scal = jnp.asarray(total, jnp.int32)[None]
    out, cnt = pl.pallas_call(
        kf,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((out_cap_words,), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ],
        interpret=interpret,
    )(scal, toks3d)
    return out, cnt[0]


def decode_tokens_walk_packed(
    off: np.ndarray, ln: np.ndarray, nxt: np.ndarray,
    *,
    off_bits: int,
    tchunk: int = DEFAULT_TCHUNK,
    interpret: bool = False,
) -> bytes:
    """Decode a full token list on device via the packed-ring walk kernel."""
    T = int(off.shape[0])
    if T == 0:
        return b""
    toks3d, ng = stage_tokens(off, ln, nxt, tchunk)
    out_len = int(ln.sum()) + T
    out_cap_words = -(-(out_len // 4 + 2) // TILE) * TILE
    out, cnt = walk_decode_packed(
        jnp.asarray(toks3d), jnp.int32(T),
        ng=ng, tchunk=tchunk, off_bits=off_bits,
        out_cap_words=out_cap_words, interpret=interpret,
    )
    b = np.asarray(out).view(np.uint8)
    n = int(cnt)
    assert n == out_len, (n, out_len)
    return b[:n].tobytes()


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
