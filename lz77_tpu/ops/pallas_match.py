"""Pallas TPU kernel for the exact match table.

The distance sweep is the codec's only heavy compute (O(n * sb) byte
compares — SURVEY.md §3.1 hot loops 1/3 collapsed into one regular scan).
The XLA formulation (`ops.match.find_matches_chunked`) streams (128, B)
temporaries through HBM; this kernel keeps the entire working set in VMEM:

* the byte buffer lives in lanes as a flat (rows, 128) int8 tile;
* each grid step owns TILE positions and loops over distance chunks of 128;
* candidate rows for chunk dc are ONE aligned row-slice of the VMEM buffer,
  and the 128 in-chunk shifts are static lane rotations (pltpu.roll);
* capped run lengths come from log2(la) doubling steps using static flat
  shifts; the running best (length, smallest distance) is an order-preserving
  int32 key in VMEM scratch.

Layout invariant: the caller pads the buffer so block position 0 sits at a
lane boundary (pad = (-d_limit) mod 128 zeros, then the halo), making every
row index aligned and every in-chunk shift static.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import spec

LANES = 128


def _flat_shift_fwd(x: jnp.ndarray, s) -> jnp.ndarray:
    """y[f] = x[f + s] for flat index f over a (rows, 128) tile, s in [0,128).

    ``s`` may be a Python int (static roll) or a traced scalar (dynamic
    rotate — Mosaic lowers pltpu.roll with a dynamic shift natively).
    The tail rows read past the block; callers slice the valid prefix.
    """
    if isinstance(s, int) and s == 0:
        return x
    lane = lax.broadcasted_iota(jnp.int32, x.shape, 1)
    a = pltpu.roll(x, LANES - s, 1)  # a[i, j] = x[i, (j + s) % 128]
    down = jnp.concatenate([x[1:], jnp.zeros_like(x[:1])], axis=0)
    b = pltpu.roll(down, LANES - s, 1)
    return jnp.where(lane < LANES - s, a, b)


def _kernel(
    scal_ref,  # (3,) int32 SMEM prefetch: avail, valid_ext, n_chunks
    hbm_ref,  # full buffer (rows, 128) int32 in HBM (one byte per lane)
    l_ref,  # (TR, 128) int32 out
    o_ref,  # (TR, 128) int32 out
    buf_ref,  # (brows, 128) int32 VMEM scratch: window + tile + lookahead
    best_ref,  # (TR + 1, 128) int32 scratch
    dma_sem,
    *,
    depth: int,
    dlim: int,
    tile: int,
    brows: int,
):
    TR = tile // LANES
    R0 = (dlim + (-dlim) % LANES) // LANES  # rows before the tile's positions
    j = pl.program_id(0)
    avail = scal_ref[0]
    valid_ext = scal_ref[1]
    n_chunks = scal_ref[2]
    kmul = dlim + 2

    # Stage this tile's window (dlim back + tile + lookahead) into VMEM.
    copy = pltpu.make_async_copy(
        hbm_ref.at[pl.ds(j * TR, brows), :], buf_ref, dma_sem
    )
    copy.start()
    copy.wait()

    X = buf_ref[R0 : R0 + TR + 1, :]  # positions p .. p + tile + 127

    row = lax.broadcasted_iota(jnp.int32, (TR + 1, LANES), 0)
    lane = lax.broadcasted_iota(jnp.int32, (TR + 1, LANES), 1)
    pos = j * tile + row * LANES + lane  # global block position per element
    cap = jnp.minimum(depth, valid_ext - pos - 1)

    best_ref[...] = jnp.zeros((TR + 1, LANES), jnp.int32)

    def chunk_body(dc, _):
        # W[f] = buffer byte at flat position (p - (dc+1)*128 + f) for the
        # tile's first position p: one aligned row slice.
        W = buf_ref[pl.ds(R0 - dc - 1, TR + 2), :]

        best = best_ref[...]
        for r in range(LANES):  # static unroll: every shift is a static roll
            d = dc * LANES + r + 1
            # S[p] = byte at p - d  ==  W shifted forward by (127 - r).
            S = _flat_shift_fwd(W, LANES - 1 - r)[: TR + 1, :]
            eq = (S == X).astype(jnp.int32)
            rl = eq
            m = 1
            while m < depth:
                rl = rl + jnp.where(rl == m, _flat_shift_fwd(rl, m), 0)
                m <<= 1
            runs = jnp.minimum(rl, cap)
            ok = (runs > 0) & (d <= dlim) & (d <= pos + avail)
            key = jnp.where(ok, runs * kmul + (dlim + 1 - d), 0)
            best = jnp.maximum(best, key)
        best_ref[...] = best
        return 0

    lax.fori_loop(0, n_chunks, chunk_body, 0)

    best = best_ref[: TR, :]
    L = best // kmul
    l_ref[...] = L
    o_ref[...] = jnp.where(L > 0, (dlim + 1) - best % kmul, 0)


def find_matches_pallas(
    block: jnp.ndarray,
    halo: jnp.ndarray,
    right: jnp.ndarray,
    avail: jnp.ndarray,
    valid_ext: jnp.ndarray,
    *,
    la: int,
    sb: int,
    tile: int = 8192,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Same contract as ``ops.match.find_matches_brute`` (Pallas backend)."""
    B = block.shape[0]
    depth = spec.len_limit(la)
    dlim = spec.d_limit(sb)
    if dlim == 0 or depth == 0:
        z = jnp.zeros((B,), jnp.int32)
        return z, z
    H = halo.shape[0]
    if H != dlim:
        raise ValueError(
            f"pallas matcher requires halo size == d_limit ({dlim}), got {H}"
        )
    if B % tile:
        raise ValueError(f"block size {B} must be a multiple of tile {tile}")
    if depth > 127:
        raise ValueError("pallas matcher supports la <= 128")

    pad0 = (-dlim) % LANES
    TR_ = tile // LANES
    R0_ = (pad0 + dlim) // LANES
    brows = R0_ + TR_ + 2
    brows += (-brows) % 8  # Mosaic: second-to-last block dim % 8 == 0
    # Flat layout: [pad0 zeros | halo | block | right | ext pad], rows of 128.
    # Tail padded so the last tile's block slice stays in range.
    n_tiles_ = B // tile
    total = max(
        pad0 + dlim + B + LANES + 256,
        ((n_tiles_ - 1) * TR_ + brows) * LANES,
    )
    total += (-total) % LANES
    buf = jnp.zeros((total,), jnp.uint8)
    buf = lax.dynamic_update_slice(buf, halo, (pad0,))
    buf = lax.dynamic_update_slice(buf, block, (pad0 + dlim,))
    buf = lax.dynamic_update_slice(buf, right, (pad0 + dlim + B,))
    # int32 lanes: Mosaic's vector ops and dynamic sub-row loads are only
    # dependable at 32-bit granularity on this toolchain.
    buf2d = buf.reshape(-1, LANES).astype(jnp.int32)

    TR = tile // LANES
    R0 = (pad0 + dlim) // LANES
    n_tiles = B // tile
    n_chunks = -(-dlim // LANES)
    scal = jnp.stack(
        [avail.astype(jnp.int32), valid_ext.astype(jnp.int32),
         jnp.int32(n_chunks)]
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(
                (TR, LANES), lambda j, *_: (j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (TR, LANES), lambda j, *_: (j, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((brows, LANES), jnp.int32),
            pltpu.VMEM((TR + 1, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )

    kernel = functools.partial(
        _kernel, depth=depth, dlim=dlim, tile=tile, brows=brows
    )
    L2d, O2d = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((B // LANES, LANES), jnp.int32),
            jax.ShapeDtypeStruct((B // LANES, LANES), jnp.int32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(scal, buf2d)
    return L2d.reshape(B), O2d.reshape(B)
