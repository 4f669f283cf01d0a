"""Greedy parse + token pack as a TPU scalar-core Pallas kernel.

TPU vector units have no gather hardware, so the pointer-doubling parse
(ops/parse.py, models/fused.py) pays ~20 ms per 2 MB for every
take_along_axis — two orders of magnitude more than the arithmetic it does.
The TPU-native alternative is this kernel: the greedy jump chain
``p <- p + L[p] + 1`` (the reference's encode loop, lz77.c:89-136) is walked
directly by the TensorCore's scalar unit over SMEM-staged inputs, one token
per iteration, while the grid pipeline streams the next chunk in.

Layout tricks that make it fast and legal under Mosaic:

* All per-position inputs are fused into ONE int32 word per byte
  ("LOX" = next_char<<24 | len<<16 | off), so each token costs two
  dependent SMEM loads (the jump word, then the next-char word).
* Mosaic forbids dynamic *lane* indexing of VMEM but allows arbitrary
  scalar indexing of SMEM, so chunks are staged into SMEM by the grid
  pipeline ((1, ROWS, chunk+OVER) blocks — last two dims (8, x*128) keep
  the block shape legal).
* Tokens are emitted COMPACTED: a 2x1024 ping-pong SMEM buffer flushes
  exact 1024-token tiles to HBM with ``pl.multiple_of``-aligned async
  copies (int32 HBM tiling demands 1024-element DMA alignment).  The
  partial tile carries across grid steps in persistent SMEM scratch, so the
  output is the exact serial token stream with zero padding inside.
* The cross-batch parse state (chain position / entry offset) rides in the
  same scratch and is returned as a scalar, so consecutive batches chain
  without host round-trips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024        # int32 HBM tiling: DMA offsets must be TILE-aligned
ROWS = 8           # sub-chunks per grid step (sublane divisibility)
OVER = 128         # staged lookahead overlap (>= la; keeps lanes aligned)
UNROLL = 4         # tokens per loop iteration (predicated; 4 < TILE)
DEFAULT_CHUNK = 2048


def _kernel(scal_ref, lox_ref, out_ref, cnt_ref, exit_ref, buf, st, sem,
            *, ng, chunk, ob, lb):
    gidx = pl.program_id(0)
    valid_total = scal_ref[1]

    @pl.when(gidx == 0)
    def _():
        st[0] = 0            # tokens emitted so far (flushed + partial)
        st[1] = scal_ref[0]  # chain position p (batch-absolute)

    def flush_tile(tile_idx):
        # flush completed tile ``tile_idx`` from its ping-pong half.
        half = tile_idx % 2
        src0 = pl.multiple_of(half * TILE, TILE)
        dst0 = pl.multiple_of(tile_idx * TILE, TILE)
        dma = pltpu.make_async_copy(
            buf.at[pl.ds(src0, TILE)], out_ref.at[pl.ds(dst0, TILE)], sem
        )
        dma.start()
        dma.wait()
        return 0

    def sub(r, carry):
        t, p0 = carry
        base = (gidx * ROWS + r) * chunk
        end = jnp.minimum(base + chunk, valid_total)
        cap2 = chunk + OVER - 1

        def cond(s):
            _, p = s
            return p < end

        def body(s):
            # UNROLL predicated token slots per iteration: an exhausted slot
            # keeps writing to the frozen index t (only [0, t) is ever read)
            # and stops advancing p, so no branches are needed inside the
            # group; the loop/flush bookkeeping amortizes over the group.
            t0, p = s
            t = t0
            for _ in range(UNROLL):
                w = lox_ref[0, r, p - base]
                ln = lax.shift_right_logical(w, 16) & 0xFF
                off = w & 0xFFFF
                w2 = lox_ref[0, r, jnp.minimum(p - base + ln, cap2)]
                nxt = lax.shift_right_logical(w2, 24) & 0xFF
                v = off | (ln << ob) | (nxt << (ob + lb))
                buf[t % (2 * TILE)] = v
                active = p < end
                t = t + jnp.where(active, 1, 0)
                p = jnp.where(active, p + ln + 1, p)
            # at most one tile boundary per group (UNROLL < TILE)
            lax.cond(
                t // TILE > t0 // TILE,
                lambda _: flush_tile(t // TILE - 1),
                lambda _: 0,
                0,
            )
            return t, p

        return lax.while_loop(cond, body, (t, p0))

    t, p = lax.fori_loop(0, ROWS, sub, (st[0], st[1]))
    st[0] = t
    st[1] = p

    @pl.when(gidx == ng - 1)
    def _():
        def final(_):
            # flush the final partial tile (overshoot bytes land past the
            # true count and are never fetched)
            half = (t // TILE) % 2
            src0 = pl.multiple_of(half * TILE, TILE)
            dst0 = pl.multiple_of((t // TILE) * TILE, TILE)
            dma = pltpu.make_async_copy(
                buf.at[pl.ds(src0, TILE)], out_ref.at[pl.ds(dst0, TILE)], sem
            )
            dma.start()
            dma.wait()
            return 0

        lax.cond(t % TILE != 0, final, lambda _: 0, 0)
        cnt_ref[0] = t
        exit_ref[0] = p - valid_total


def walk_geometry(n: int, chunk: int = DEFAULT_CHUNK):
    """(nc, ng, Tcap) for a batch span of n bytes."""
    nc = -(-n // (chunk * ROWS)) * ROWS
    ng = nc // ROWS
    Tcap = nc * chunk + TILE
    return nc, ng, Tcap


def build_lox(L_flat, O_flat, x_flat, tail, n_pad: int):
    """Fuse per-position match tables + bytes into the staged LOX words.

    L_flat/O_flat: (N,) int32 match tables; x_flat: (N,) uint8 input bytes;
    tail: (>=la,) uint8 bytes following the span (right extension of the
    last block).  Pads to n_pad positions.  Returns (n_pad + OVER,) int32.
    """
    N = L_flat.shape[0]
    x_ext = jnp.concatenate(
        [x_flat, tail, jnp.zeros((max(0, n_pad + OVER - N - tail.shape[0]),),
                                 jnp.uint8)]
    )[: n_pad + OVER].astype(jnp.int32)
    lz = jnp.concatenate([
        O_flat | (L_flat << 16),
        jnp.zeros((n_pad + OVER - N,), jnp.int32),
    ])
    return lz | (x_ext << 24)


def stage_lox(lox: jnp.ndarray, chunk: int, ng: int) -> jnp.ndarray:
    """(nc*chunk + OVER,) LOX words -> (ng, ROWS, chunk+OVER) staged blocks.

    Pure reshapes/slices (no gathers): each chunk row carries the next
    chunk's first OVER words as its lookahead overlap.
    """
    nc = ng * ROWS
    body = lox[: nc * chunk].reshape(nc, chunk)
    shifted = lox[chunk:]
    pad = nc * chunk - shifted.shape[0]
    if pad > 0:
        shifted = jnp.concatenate(
            [shifted, jnp.zeros((pad,), jnp.int32)]
        )
    tails = shifted[: nc * chunk].reshape(nc, chunk)[:, :OVER]
    return jnp.concatenate([body, tails], axis=1).reshape(
        ng, ROWS, chunk + OVER
    )


@functools.partial(
    jax.jit, static_argnames=("ng", "chunk", "ob", "lb", "interpret")
)
def walk_parse_pack(
    lox3d: jnp.ndarray,   # (ng, ROWS, chunk+OVER) int32 staged LOX
    entry: jnp.ndarray,   # scalar int32: parse entry into the span
    valid_total: jnp.ndarray,  # scalar int32: valid bytes in the span
    *,
    ng: int,
    chunk: int,
    ob: int,
    lb: int,
    interpret: bool = False,
):
    """Serial greedy parse + pack: returns (tokens, count, exit_entry).

    tokens is (Tcap,) int32, the first ``count`` entries are the packed
    token words (off | len<<ob | next<<(ob+lb)) of the exact global parse.
    """
    nc = ng * ROWS
    Tcap = nc * chunk + TILE
    kf = functools.partial(_kernel, ng=ng, chunk=chunk, ob=ob, lb=lb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ng,),
        in_specs=[
            pl.BlockSpec((1, ROWS, chunk + OVER), lambda c, *_: (c, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.SMEM((2 * TILE,), jnp.int32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    scal = jnp.stack(
        [jnp.asarray(entry, jnp.int32), jnp.asarray(valid_total, jnp.int32)]
    )
    tokens, cnt, exit_e = pl.pallas_call(
        kf,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Tcap,), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ],
        interpret=interpret,
    )(scal, lox3d)
    return tokens, cnt[0], exit_e[0]
