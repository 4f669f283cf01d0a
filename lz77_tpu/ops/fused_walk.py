"""Merged sweep+walk kernel: match and parse co-issued in ONE Pallas kernel.

The fused encode's two stages occupy different execution units — the
bit-plane match sweep is pure VPU slab work (~190 MB/s standalone,
ops/pallas_bitplane.py) and the greedy walk parse is pure scalar-unit SMEM
chasing (~196 MB/s, ops/parse_walk.py) — but as separate Pallas kernels
they can never overlap: one TensorCore runs one program at a time.
Measured (experiments/coissue.py): a dependent scalar SMEM chain co-issues
with queued vector slab work at ~96% overlap efficiency when both live in
the SAME loop body, and ~0% across sequential loop nests.

So this kernel merges them with a one-block software pipeline over the
grid: step g sweeps block g's match tables (windows + extraction, vector)
while walking block g-1's greedy chain (scalar), the walk paced by
POSITION so it keeps up with the sweep regardless of token density:

  * grid = (G+1,): step g sweeps block g (g < G) and walks block g-1
    (g >= 1); the last step is a pure drain.
  * The extraction writes per-bit-position LOX planes
    (off | len<<16 | byte<<24, the walk's fused word — parse_walk.py) into
    a VMEM ping-pong instead of returning (L, O) to HBM: the match tables
    never leave the core, which also deletes the XLA un-stride/stage
    round-trip (~8 B/input-byte of HBM traffic) between the two old
    kernels.
  * The walk stages one (rr, 128) LOX plane pair into SMEM via double-
    buffered DMA (Mosaic allows arbitrary scalar indexing only in SMEM)
    and walks the chain in UNROLL-slot predicated groups, exactly like
    parse_walk._kernel; plane-strided addressing costs ~4 extra scalar
    ops per load (position q lives at element (q & (rr-1), q >> log2(rr))
    of plane q >> log2(nw)).
  * Tokens flush through the same 2x1024 ping-pong SMEM tile DMA, so the
    output is the exact serial token stream (byte-identical to every
    other backend).

Replaces lz77.c:89-136 + 246-251 with both halves of the work on their
own units simultaneously.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import spec
from . import bitplane
from . import pallas_bitplane as pb

LANES = 128
TILE = 1024      # int32 HBM tiling: token-flush DMA offsets must align
UNROLL = 4
# Route the production fused pipeline through the merged kernel.  Flipped
# on once hardware parity is verified for a geometry class (the
# two-kernel pipeline remains the fallback either way).
MERGED_DEFAULT = False


def _kernel(
    scal_ref,     # (2 + G,) int32: [entry0, valid_total, ve_0..ve_{G-1}]
    planes_ref,   # (1, 9, rr, 128) int32: block min(g, G-1)'s planes
    out_ref,      # (Tcap,) int32 ANY: packed token words
    cnt_ref,      # (1,) SMEM
    exit_ref,     # (1,) SMEM
    sp_scr, m_scr, found_scr, dp_scr, dsel_scr, need_scr,  # sweep VMEM
    lox_scr,      # (2, 32, rr, 128) VMEM: LOX planes ping-pong
    stage_scr,    # (2, rr, 128) SMEM: staged LOX plane pair
    buf,          # (2*TILE,) SMEM: token ping-pong
    st,           # (4,) SMEM: [tokens, walk p / entry, jcur, tiles flushed]
    sem,          # DMA semaphore: token flush
    sem2,         # DMA semaphore: plane staging
    *,
    G: int,
    depth: int,
    dlim: int,
    dbits: int,
    n_windows: int,
    H: int,
    nw: int,
    rr: int,
    B: int,
    ob: int,
    lb: int,
    interp: bool = False,
):
    gidx = pl.program_id(0)
    valid_total = scal_ref[1]
    log2nw = nw.bit_length() - 1
    log2rr = rr.bit_length() - 1
    src_slot = (gidx + 1) & 1          # lox half written at step g-1
    # walk span: block g-1's valid bytes (0 at step 0 / padded tail)
    end = jnp.where(
        gidx == 0, 0, jnp.clip(valid_total - (gidx - 1) * B, 0, B)
    )
    pace = max(1, B // (n_windows + 32))

    @pl.when(gidx == 0)
    def _():
        st[0] = 0            # tokens emitted (flushed + partial)
        st[1] = scal_ref[0]  # walk entry for block 0
        st[2] = 0
        st[3] = 0            # completed tiles flushed to HBM

    def flush_tile(tile_idx):
        half = tile_idx % 2
        src0 = pl.multiple_of(half * TILE, TILE)
        dst0 = pl.multiple_of(tile_idx * TILE, TILE)
        dma = pltpu.make_async_copy(
            buf.at[pl.ds(src0, TILE)], out_ref.at[pl.ds(dst0, TILE)], sem
        )
        dma.start()
        dma.wait()
        return 0

    def flush_upto(t):
        # catch-up flush cursor: every COMPLETED tile below t//TILE goes
        # out exactly once (a per-call crossed-a-tile test is wrong at
        # interleave boundaries — the r5 hardware bug where the check
        # compared t against itself and 12 tiles of tokens never left
        # SMEM).
        def body(k):
            flush_tile(k)
            return k + 1

        st[3] = lax.while_loop(lambda k: k < t // TILE, body, st[3])

    def stage_plane(j, slot):
        dma = pltpu.make_async_copy(
            lox_scr.at[src_slot, j], stage_scr.at[slot], sem2
        )
        dma.start()
        dma.wait()

    # ---- initial plane staging for this step's walk block -----------------
    @pl.when(end > 0)
    def _():
        p0 = st[1]
        jc0 = (H + p0) >> log2nw
        st[2] = jc0
        stage_plane(jc0, jc0 & 1)

        @pl.when(jc0 + 1 < 32)
        def _():
            stage_plane(jc0 + 1, (jc0 + 1) & 1)

    def walk_group(s, target):
        # one bounded group: advance the staged plane pair if the cursor
        # crossed, then UNROLL predicated token slots (parse_walk.py:79).
        p, t, jcur = s
        adv = (H + p) >= (jcur + 1) * nw
        jcur = jcur + jnp.where(adv, 1, 0)

        @pl.when(adv & (jcur + 1 < 32))
        def _():
            stage_plane(jcur + 1, (jcur + 1) & 1)

        pe = jnp.minimum(target, (jcur + 1) * nw - H)
        for _ in range(UNROLL):
            gpos = H + p
            q = gpos & (nw - 1)
            w = stage_scr[jcur & 1, q & (rr - 1), q >> log2rr]
            ln = lax.shift_right_logical(w, 16) & 0xFF
            off = w & 0xFFFF
            g2 = gpos + ln
            q2 = g2 & (nw - 1)
            w2 = stage_scr[
                lax.shift_right_logical(g2, log2nw) & 1,
                q2 & (rr - 1), q2 >> log2rr,
            ]
            nxt = lax.shift_right_logical(w2, 24) & 0xFF
            v = off | (ln << ob) | (nxt << (ob + lb))
            buf[t % (2 * TILE)] = v
            active = p < pe
            t = t + jnp.where(active, 1, 0)
            p = jnp.where(active, p + ln + 1, p)
        flush_upto(t)
        return p, t, jcur

    def walk_to(target_raw):
        target = jnp.minimum(target_raw, end)

        def cond(s):
            return s[0] < target

        p, t, jcur = lax.while_loop(
            cond, lambda s: walk_group(s, target), (st[1], st[0], st[2])
        )
        st[0] = t
        st[1] = p
        st[2] = jcur

    # ---- inline walk slots ------------------------------------------------
    # SLOTS predicated token emissions, generated as straight-line code in
    # the MIDDLE of the sweep's unrolled vector body: Mosaic packs scalar
    # and vector slots of one basic block into shared VLIW bundles, so the
    # walk rides in the sweep's spare scalar issue slots.  Putting the walk
    # in its own loop instead (a separate region) measured ZERO overlap —
    # see experiments/coissue.py and the kernel docstring.
    #
    # ``cell`` = [p, t, jcur, pe, slot] — traced values threaded through
    # the unrolled body by closure; persisted via ``st`` at region
    # boundaries.  ``pe`` caps token STARTS at min(pace target, staged
    # plane end, block end), so jcur/slot are loop-invariant inside a
    # window; overhang reads may touch plane jcur+1, which is staged.
    SLOTS = int(__import__("os").environ.get("LZ77_FW_SLOTS", "2"))

    def make_inter(cell):
        def inter():
            p, t = cell[0], cell[1]
            pe, slot = cell[3], cell[4]
            for _ in range(SLOTS):
                gpos = H + p
                q = gpos & (nw - 1)
                w = stage_scr[slot, q & (rr - 1), q >> log2rr]
                ln = lax.shift_right_logical(w, 16) & 0xFF
                off = w & 0xFFFF
                g2 = gpos + ln
                q2 = g2 & (nw - 1)
                w2 = stage_scr[
                    lax.shift_right_logical(g2, log2nw) & 1,
                    q2 & (rr - 1), q2 >> log2rr,
                ]
                nxt = lax.shift_right_logical(w2, 24) & 0xFF
                v = off | (ln << ob) | (nxt << (ob + lb))
                buf[t & (2 * TILE - 1)] = v
                active = p < pe
                t = t + jnp.where(active, 1, 0)
                p = jnp.where(active, p + ln + 1, p)
            cell[0], cell[1] = p, t
        return inter

    def fixup(cell, target):
        """Window-boundary bookkeeping (control flow allowed here): flush
        completed token tiles, advance the staged plane pair, recompute
        the slot cap for the next window."""
        p, t, jcur = cell[0], cell[1], cell[2]
        flush_upto(t)
        adv = (H + p) >= (jcur + 1) * nw
        jcur = jcur + jnp.where(adv, 1, 0)

        @pl.when(adv & (jcur + 1 < 32))
        def _():
            stage_plane(jcur + 1, (jcur + 1) & 1)

        cell[2] = jcur
        cell[3] = jnp.minimum(
            jnp.minimum(target, end), (jcur + 1) * nw - H
        )
        cell[4] = jcur & 1

    # ---- sweep of block g, walk of block g-1 interleaved ------------------
    @pl.when(gidx < G)
    def _():
        P = planes_ref[0]
        sp_scr[...] = P
        found_scr[...] = jnp.zeros_like(found_scr)
        dp_scr[...] = jnp.zeros_like(dp_scr)
        pb._init_need(
            need_scr, scal_ref[2 + gidx], depth=depth, H=H, nw=nw, rr=rr
        )
        _, _, window_core, missing_any = pb._sweep_funcs(
            P, sp_scr, m_scr, found_scr, dp_scr, need_scr,
            depth=depth, dlim=dlim, dbits=dbits,
        )

        # KW windows unroll per while-body (one early-exit sync per group).
        # Interpret mode keeps KW=1: the unrolled body is compile-time-
        # dominated on XLA CPU (4x body => minutes per geometry in tests).
        KW = 1 if interp else 4
        n_groups = -(-n_windows // KW)

        def merged_group(carry):
            gi, live, p0, t0, jc0 = carry
            cell = [p0, t0, jc0, jnp.int32(0), jc0 & 1]
            inter = make_inter(cell)
            for kk in range(KW):
                widx = gi * KW + kk
                fixup(cell, (widx + 1) * pace)
                # past-the-end windows (ragged n_windows % KW tail) sweep
                # distances > dlim, which the core masks to no-ops — and
                # the walk slots they carry still run.  A pl.when guard
                # here would silently DROP the walk cell updates (branch-
                # local Python-cell mutations don't escape a traced cond).
                window_core(widx, inter=inter)
            # one early-exit sync per KW windows (each read of the reduce
            # costs a vector->scalar drain)
            return gi + 1, missing_any(), cell[0], cell[1], cell[2]

        def cond(carry):
            gi, live = carry[0], carry[1]
            return (gi < n_groups) & live

        gi, live, p, t, jcur = lax.while_loop(
            cond, merged_group,
            (jnp.int32(0), jnp.bool_(True), st[1], st[0], st[2]),
        )
        st[0] = t
        st[1] = p
        st[2] = jcur

        # ---- extraction -> LOX planes, walk slots inlined per plane -------
        pb._cap_found(m_scr, found_scr, need_scr, depth=depth)
        for b in range(dbits):
            pb._dsel_body(b, m_scr, dp_scr, dsel_scr, depth=depth, rr=rr)
        cell = [st[1], st[0], st[2], jnp.int32(0), st[2] & 1]
        inter = make_inter(cell)
        for j in range(32):
            fixup(cell, ((j + 1) * end) // 32)
            for _ in range(4):  # ~24 slots per plane, same basic block
                inter()
            l, o = pb._unpack_j(j, m_scr, dsel_scr, dbits=dbits, rr=rr)
            x = (P[0] >> j) & 1
            for bb in range(1, 8):
                x = x | (((P[bb] >> j) & 1) << bb)
            lox_scr[gidx & 1, j] = o | (l << 16) | (x << 24)
        st[0] = cell[1]
        st[1] = cell[0]
        st[2] = cell[2]

    # pure drain (also the whole body of the final step)
    walk_to(end)
    flush_upto(st[0])  # inline slots since the last fixup may have crossed
    st[1] = st[1] - end  # exit overhang of block g-1 = entry of block g

    @pl.when(gidx == G)
    def _():
        t = st[0]

        def final(_):
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
        exit_ref[0] = st[1]


def geometry(la: int, sb: int, B: int, H: int, R: int):
    """(nw, rr, depth, dlim, dbits, n_windows) for the merged kernel.

    ``nw`` is padded up to a power-of-two multiple of 128 (the walk's
    plane addressing uses shifts/masks) with rr > depth (the sweep's
    run-mask row shifts).  Returns None when the geometry is unsupported
    (caller falls back to the two-kernel pipeline).
    """
    depth = spec.len_limit(la)
    dlim = spec.d_limit(sb)
    if depth == 0 or dlim == 0 or H != dlim:
        return None
    n_real = H + B + R
    nw0 = -(-n_real // 32)
    rr = 1
    while rr * LANES < nw0 or rr <= depth:
        rr <<= 1
    nw = rr * LANES
    dbits = max(dlim.bit_length(), 6)
    n_windows = -(-dlim // 32)
    scratch_planes = 9 + 9 + 3 * depth + dbits * depth + dbits + 2 * 32
    if (scratch_planes * rr * LANES * 4) > pb.VMEM_BUDGET_BYTES:
        return None
    return nw, rr, depth, dlim, dbits, n_windows


@functools.partial(
    jax.jit, static_argnames=("la", "sb", "interpret")
)
def encode_batch_sweepwalk(
    blocks: jnp.ndarray,      # (G, B) uint8
    halos: jnp.ndarray,       # (G, H) uint8
    rights: jnp.ndarray,      # (G, R) uint8
    avails: jnp.ndarray,      # (G,) int32
    valid_exts: jnp.ndarray,  # (G,) int32
    valid_total: jnp.ndarray,  # scalar int32
    entry0: jnp.ndarray,      # scalar int32
    *,
    la: int,
    sb: int,
    interpret: bool = False,
):
    """One merged-kernel device step; same contract as encode_batch_walk.

    Returns (payload, counts_dummy, total_tokens, exit_entry); payload is
    the packed token bytes (valid prefix = total * width/8).
    """
    params = spec.Params(la=la, sb=sb)
    if params.width % 8 != 0:
        raise ValueError("fused pipeline requires byte-aligned token width")
    G, B = blocks.shape
    H = halos.shape[1]
    R = rights.shape[1]
    geo = geometry(la, sb, B, H, R)
    if geo is None:
        raise ValueError("unsupported merged-kernel geometry")
    nw, rr, depth, dlim, dbits, n_windows = geo
    n_real = H + B + R

    pv_cm = jax.vmap(
        lambda b, h, r, a, v: pb._prep_planes(
            b, h, r, a, v, nw=nw, H=H, n_real=n_real
        )
    )(blocks, halos, rights, avails, valid_exts)  # (G, 9, rr, 128)

    Tcap = -(-(G * B) // TILE) * TILE + TILE
    kf = functools.partial(
        _kernel, G=G, depth=depth, dlim=dlim, dbits=dbits,
        n_windows=n_windows, H=H, nw=nw, rr=rr, B=B,
        ob=params.off_bits, lb=params.len_bits, interp=interpret,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G + 1,),
        in_specs=[
            pl.BlockSpec(
                (1, 9, rr, LANES),
                lambda g, *_: (jnp.minimum(g, G - 1), 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((9, rr, LANES), jnp.int32),
            pltpu.VMEM((depth, rr, LANES), jnp.int32),
            pltpu.VMEM((depth, rr, LANES), jnp.int32),
            pltpu.VMEM((dbits * depth, rr, LANES), jnp.int32),
            pltpu.VMEM((dbits, rr, LANES), jnp.int32),
            pltpu.VMEM((depth, rr, LANES), jnp.int32),
            pltpu.VMEM((2, 32, rr, LANES), jnp.int32),
            pltpu.SMEM((2, rr, LANES), jnp.int32),
            pltpu.SMEM((2 * TILE,), jnp.int32),
            pltpu.SMEM((4,), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    scal = jnp.concatenate([
        jnp.stack([
            jnp.asarray(entry0, jnp.int32),
            jnp.asarray(valid_total, jnp.int32),
        ]),
        jnp.asarray(valid_exts, jnp.int32),
    ])
    tokens, cnt, exit_e = pl.pallas_call(
        kf,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Tcap,), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ],
        interpret=interpret,
    )(scal, pv_cm)
    nb = params.width // 8
    shifts = (jnp.arange(nb, dtype=jnp.int32) * 8)[None, :]
    payload = (
        (lax.shift_right_logical(tokens[:, None], shifts)) & jnp.int32(0xFF)
    ).astype(jnp.uint8).reshape(Tcap * nb)
    return payload, jnp.zeros((G,), jnp.int32), cnt[0], exit_e[0]
