"""Pallas TPU port of the bit-plane exact matcher (ops/bitplane.py).

Same algorithm — 8 byte bit-planes + a validity plane, incremental one-word
shifts per distance, prefix-AND run masks, first-touch distance-bit
recording — but with every piece of sweep state (shifted planes, found
masks, distance planes) resident in VMEM scratch.  The XLA formulation
materialises its carried state to HBM at every fusion boundary, which caps
it at ~15 MB/s on a v5e; this kernel reaches ~196 MB/s device-resident at
the tile-exact ``preferred_block_size`` geometry (slope-timed, see
bench.py; ~44x the int-domain Pallas sweep in ops/pallas_match.py).

First-touch distance recording is split by bit position of the distance d:
bits 5+ are window-constant (folded once per 32-distance window from a
found-mask diff), bits 0-1 of the in-window step are folded directly at
each step, and bits 2-4 telescope — bit b of the step is constant over
runs of 2^b consecutive steps and found-masks are monotone, so each run's
first-touch set is ``found_end & ~found_start`` (7 snapshots + 7 folds per
window instead of 48 per-step folds; measured 1.15x end to end).

Layout: words are packed COLUMN-MAJOR into (RR, 128) tiles — word
``w = c * RR + r`` lives at element (r, c) — so the per-distance one-word
plane shift is a cheap sublane concatenation plus a single-row lane roll,
instead of a whole-array cross-lane roll (measured 1.4x faster; lane
shuffles are the expensive VPU op).  The stripe-wrap semantics of the
strided bit layout (bitplane.py) are preserved: the word wrapping off the
plane's end moves up one stripe (``<< 1`` at element (0, 0)); run-mask
shifts move wrapped words down one stripe (logical ``>> 1``).

Extraction (found masks + distance planes -> per-position L, O) runs INSIDE
the kernel: the lookahead-shrinkage cap is applied with threshold bitmasks,
the k = L distance planes are selected in the bit domain
(``mask_k = capped_found_k & ~capped_found_{k+1}`` — found is monotone in
k), and a 32-iteration unpack loop writes (L, O) int32 rows directly, so
the sweep's 1.7 MB of bit-state per block never leaves VMEM.  Results are
bit-exact with every other matcher (tested in interpret mode and on
hardware).
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

LANES = 128
VMEM_BUDGET_BYTES = 13 << 20  # leave headroom under the ~16 MB/core VMEM


def preferred_block_size(
    la: int | None = None, sb: int | None = None, *, rows: int = 32
) -> int:
    """Block size whose bit-plane geometry exactly fills ``rows`` word-rows.

    Mosaic processes int32 planes in (8, 128) sublane x lane tiles, so a
    plane of ``rr`` word-rows costs ``ceil(rr / 8) * 8`` rows of vector
    work: an ``rr`` that is not a multiple of 8 wastes up to a third of
    every op (the default 64 KiB block gives rr = 20, padded to 24).
    Choosing ``B = rows * 4096 - (d_limit + len_limit)`` makes the block +
    halo + right extension fill the (rows, 128) word grid exactly.
    Measured on v5e at reference defaults: 170 MB/s device-resident at
    rows=32 vs 93 MB/s at the naive 64 KiB block (rows=24 is within 3%;
    rows=64 regresses ~20%).
    """
    la = spec.DEFAULT_LA_SIZE if la is None else la
    sb = spec.DEFAULT_SB_SIZE if sb is None else sb
    depth = spec.len_limit(la)
    rr = max(rows, ((depth + 8) // 8) * 8)  # kernel needs rr > depth
    b = rr * 32 * LANES - (spec.d_limit(sb) + depth)
    return max(2, b - (b % 2))  # codec packs length nibbles in pairs


def _rot_src(x: jnp.ndarray) -> jnp.ndarray:
    """One-word forward rotate (bit at position - 1), column-major words.

    y[r, c] = x[r-1, c]; row 0 takes the previous column of the last row;
    the word wrapping off the plane end (element (0, 0)) moves UP one
    stripe (``<< 1``).
    """
    last = x[..., -1:, :]
    row0 = pltpu.roll(last, 1, x.ndim - 1)  # [c] = last[c - 1]
    lane = lax.broadcasted_iota(jnp.int32, row0.shape, x.ndim - 1)
    row0 = jnp.where(lane == 0, row0 << 1, row0)
    return jnp.concatenate([row0, x[..., :-1, :]], axis=-2)


def _rot_pos(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Bit at (position + k), static 0 < k < RR, column-major words.

    y[r, c] = x[r+k, c]; the k wrapped rows take the next column and the
    words wrapping off the plane end move DOWN a stripe (logical ``>> 1``).
    """
    head = x[..., :k, :]
    rolled = pltpu.roll(head, LANES - 1, x.ndim - 1)  # [c] = head[c + 1]
    lane = lax.broadcasted_iota(jnp.int32, rolled.shape, x.ndim - 1)
    rolled = jnp.where(
        lane == LANES - 1, lax.shift_right_logical(rolled, jnp.int32(1)),
        rolled,
    )
    return jnp.concatenate([x[..., k:, :], rolled], axis=-2)


def _init_need(need_scr, ve0, *, depth, H, nw, rr):
    """Saturation masks for the early-exit check + extraction caps.

    need_scr[k] = positions whose (L, O) output depends on length k+1:
    inside the emitted range [H, H + ve), below the lookahead-shrinkage cap
    (same thresholds the extraction applies).  Once every needed bit is
    found, no later distance can change any output — stop the sweep.
    """
    row0 = lax.broadcasted_iota(jnp.int32, (rr, LANES), 0)
    col0 = lax.broadcasted_iota(jnp.int32, (rr, LANES), 1)
    w0 = col0 * rr + row0

    def _thresh(T):
        def jbody(j, acc):
            return acc | (jnp.where(w0 < T - j * nw, 1, 0) << j)
        return lax.fori_loop(0, 32, jbody, jnp.zeros((rr, LANES), jnp.int32))

    def _clear(mask, t):
        tc = jnp.maximum(t, 0)
        j = tc // nw
        wt = tc - j * nw
        hot = (w0 == wt) & (t >= 0)
        return mask & ~(jnp.where(hot, 1, 0) << j)

    halo_mask = _thresh(H)  # positions in the halo: results are sliced away
    mk0 = _thresh(H + ve0 - 1)
    for k in range(depth):
        need_scr[k] = mk0 & ~halo_mask
        mk0 = _clear(mk0, H + ve0 - k - 2)


def _sweep_funcs(
    P, sp_scr, m_scr, found_scr, dp_scr, need_scr, *, depth, dlim, dbits
):
    """The distance-window sweep bodies over shared scratch refs.

    Returns (window, window_lengths_only): while-loop bodies with carry
    (window_index, live).  Factored out of the single-block kernel so the
    merged sweep+walk kernel (ops/fused_walk.py) can interleave scalar-core
    walk groups into the same loop (VERDICT r4 next #1: the two stages
    co-issue at ~96% efficiency when they share one loop body — measured,
    experiments/coissue.py).
    """

    def window_lengths_only(carry):
        # Measurement-only sweep variant (see find_matches_bitplane_pallas
        # record_offsets=False): identical run-mask + found + early-exit
        # work, but ALL first-touch offset machinery (newly, distance-bit
        # folds, snapshots) removed — the upper bound on any
        # offset-recovery rewrite (docs/ROOFLINE.md).
        widx, _ = carry
        base = widx * 32
        for i in range(32):
            spn = _rot_src(sp_scr[...])
            sp_scr[...] = spn
            acc = spn[0] ^ P[0]
            for b in range(1, 8):
                acc = acc | (spn[b] ^ P[b])
            eq = ~acc & spn[8]
            d = base + i + 1
            eq = jnp.where(d <= dlim, eq, 0)
            m_scr[0] = eq
            m = eq
            for k in range(1, depth):
                m = m & _rot_pos(eq, k)
                m_scr[k] = m
            found_scr[...] = found_scr[...] | m_scr[...]
        missing = need_scr[0] & ~found_scr[0]
        for k in range(1, depth):
            missing = missing | (need_scr[k] & ~found_scr[k])
        return widx + 1, jnp.any(missing != 0)

    def window_core(widx, inter=None):
        # ``inter``: straight-line callback invoked after each distance
        # sub-step.  The merged sweep+walk kernel (ops/fused_walk.py) uses
        # it to inline predicated scalar walk slots INTO this unrolled
        # body: Mosaic packs scalar and vector slots of the same basic
        # block into shared VLIW bundles, which is the only overlap
        # mechanism that works (measured: nested loops / sequential nests
        # get ~0% overlap, experiments/coissue.py).
        base = widx * 32
        fstart = found_scr[...]
        win = snapA = snapB = snapC = None
        for i in range(32):
            if inter is not None:
                inter()
            spn = _rot_src(sp_scr[...])
            sp_scr[...] = spn
            acc = spn[0] ^ P[0]
            for b in range(1, 8):
                acc = acc | (spn[b] ^ P[b])
            eq = ~acc & spn[8]
            d = base + i + 1
            eq = jnp.where(d <= dlim, eq, 0)
            m_scr[0] = eq
            m = eq
            for k in range(1, depth):
                # independent shifts of eq (not an incremental chain): the
                # k rotations have no serial dependency, so the VPU can
                # overlap them with the AND chain.
                m = m & _rot_pos(eq, k)
                m_scr[k] = m
            if inter is not None:
                inter()  # second fine-grained co-issue point per distance
            t = i + 1
            # ``newly`` (the first-touch set) is materialized only on steps
            # that fold it into a distance plane; on pure bookkeeping steps
            # found |= m is the same update at half the slab traffic.
            fold_bits = [b for b in range(2) if (t >> b) & 1]
            if i == 31 or fold_bits:
                newly = m_scr[...] & ~found_scr[...]
            else:
                newly = None
            if i == 31:
                # snapshot BEFORE i=31's update: d = base+32's high bits are
                # folded separately below, not with the window's.
                f31 = found_scr[...]
                win = f31 & ~fstart
                # telescoped low-bit runs ending at t=31 (see below)
                for b, snap in ((2, snapA), (3, snapB), (4, snapC)):
                    s = b * depth
                    dp_scr[s : s + depth] = dp_scr[s : s + depth] | (
                        f31 & ~snap
                    )
            if newly is not None:
                found_scr[...] = found_scr[...] | newly
            else:
                found_scr[...] = found_scr[...] | m_scr[...]
            if i < 31:
                # Bits 0-1 of the first-touch step t: direct per-step fold
                # (their runs are too short for snapshot diffs to pay off).
                for b in fold_bits:
                    s = b * depth
                    dp_scr[s : s + depth] = dp_scr[s : s + depth] | newly
                # Bits 2-4: bit b of t is set over runs of 2^b consecutive
                # steps, and found is monotone, so the run's first-touch
                # set telescopes to found_end & ~found_start — one snapshot
                # + one fold per run instead of a fold at every step
                # (3 x 16 per-step folds -> 7 snapshots + 7 folds).
                f = None
                if t in (7, 15, 23):  # ends of bit-2 runs [4,7],[12,15],[20,23]
                    f = found_scr[...]
                    s = 2 * depth
                    dp_scr[s : s + depth] = dp_scr[s : s + depth] | (
                        f & ~snapA
                    )
                if t == 15:  # end of bit-3 run [8,15]
                    s = 3 * depth
                    dp_scr[s : s + depth] = dp_scr[s : s + depth] | (
                        f & ~snapB
                    )
                if t in (3, 11, 19, 27):  # bit-2 run starts - 1
                    snapA = found_scr[...]
                if t in (7, 23):  # bit-3 run starts - 1
                    snapB = f
                if t == 15:  # bit-4 run [16,31] start - 1
                    snapC = f
            else:
                # d = base + 32 has zero low bits; fold its high bits now.
                for b in range(5, dbits):
                    hot = ((base + 32) >> b) & 1
                    s = b * depth
                    dp_scr[s : s + depth] = jnp.where(
                        hot != 0, dp_scr[s : s + depth] | newly,
                        dp_scr[s : s + depth],
                    )
        # newly-found over d in [base+1, base+31]: found diff vs the window
        # start snapshot, taken before i=31 (whose bits were folded above).
        for b in range(5, dbits):
            hot = (base >> b) & 1
            s = b * depth
            dp_scr[s : s + depth] = jnp.where(
                hot != 0, dp_scr[s : s + depth] | win, dp_scr[s : s + depth]
            )

    def missing_any():
        # Early-exit condition: every needed (position, length<=cap) bit
        # found means no later distance can change any emitted output
        # (runs-class inputs saturate after a handful of windows; ~1%
        # overhead on text).  NOTE: reading this forces a vector->scalar
        # sync that drains the VPU queue — callers interleaving scalar
        # work (ops/fused_walk.py) must issue it only once per window
        # GROUP, after the scalar work, or the overlap is lost.
        missing = need_scr[0] & ~found_scr[0]
        for k in range(1, depth):
            missing = missing | (need_scr[k] & ~found_scr[k])
        return jnp.any(missing != 0)

    def window(carry):
        widx, _ = carry
        window_core(widx)
        return widx + 1, missing_any()

    return window, window_lengths_only, window_core, missing_any


def _cap_found(m_scr, found_scr, need_scr, *, depth):
    """capped found: found_k & need_k (the extraction caps), into m_scr."""
    for k in range(depth):  # k-th entry = length k+1
        m_scr[k] = found_scr[k] & need_scr[k]


def _dsel_body(b, m_scr, dp_scr, dsel_scr, *, depth, rr):
    """Selection plane for distance bit b: mask_k picks positions whose
    capped L == k+1 (capped found is monotone in k), OR-combined over the
    distance planes."""
    acc = jnp.zeros((rr, LANES), jnp.int32)
    for k in range(depth):
        nxt = m_scr[k + 1] if k + 1 < depth else jnp.zeros(
            (rr, LANES), jnp.int32
        )
        acc = acc | (m_scr[k] & ~nxt & dp_scr[b * depth + k])
    dsel_scr[b] = acc


def _unpack_j(j, m_scr, dsel_scr, *, dbits, rr, record_offsets=True):
    """(L, O) slabs for bit-position plane j from capped found + dsel."""
    cf = m_scr[...]
    l = ((cf >> j) & 1).sum(axis=0)
    if record_offsets:
        dv = (dsel_scr[0] >> j) & 1
        for b in range(1, dbits):
            dv = dv | (((dsel_scr[b] >> j) & 1) << b)
    else:
        dv = jnp.ones((rr, LANES), jnp.int32)  # measurement-only sentinel
    return l, jnp.where(l > 0, dv, 0)


def _kernel(
    scal_ref,    # (1,) int32 prefetch: valid_ext
    planes_ref,  # (1, 9, RR, 128) int32: 8 bit-planes + validity
    l_out,       # (1, 32, RR, 128) int32: L per position, strided rows
    o_out,       # (1, 32, RR, 128) int32: O per position, strided rows
    sp_scr,      # (9, RR, 128)
    m_scr,       # (depth, RR, 128): run masks, then capped found masks
    found_scr,   # (depth, RR, 128)
    dp_scr,      # (dbits * depth, RR, 128)
    dsel_scr,    # (dbits, RR, 128)
    need_scr,    # (depth, RR, 128): saturation masks (early exit + caps)
    *,
    depth: int,
    dlim: int,
    dbits: int,
    n_windows: int,
    H: int,
    nw: int,
    rr: int,
    record_offsets: bool = True,
):
    P = planes_ref[0]
    sp_scr[...] = P
    found_scr[...] = jnp.zeros_like(found_scr)
    dp_scr[...] = jnp.zeros_like(dp_scr)
    _init_need(need_scr, scal_ref[0], depth=depth, H=H, nw=nw, rr=rr)

    window, window_lengths_only, _, _ = _sweep_funcs(
        P, sp_scr, m_scr, found_scr, dp_scr, need_scr,
        depth=depth, dlim=dlim, dbits=dbits,
    )

    def cond(carry):
        widx, live = carry
        return (widx < n_windows) & live

    lax.while_loop(
        cond,
        window if record_offsets else window_lengths_only,
        (jnp.int32(0), jnp.bool_(True)),
    )

    # ---- in-kernel extraction --------------------------------------------
    _cap_found(m_scr, found_scr, need_scr, depth=depth)
    if record_offsets:
        for b in range(dbits):
            _dsel_body(b, m_scr, dp_scr, dsel_scr, depth=depth, rr=rr)

    def unpack(j, _):
        l, o = _unpack_j(
            j, m_scr, dsel_scr, dbits=dbits, rr=rr,
            record_offsets=record_offsets,
        )
        l_out[0, pl.ds(j, 1)] = l[None]
        o_out[0, pl.ds(j, 1)] = o[None]
        return 0

    lax.fori_loop(0, 32, unpack, 0)


def _prep_planes(block, halo, right, avail, valid_ext, *, nw, H, n_real):
    """(9, rr, 128) column-major bit-planes + validity for one block span.

    Word c*rr + r lives at element (r, c) (the column-major layout the
    sweep kernels want); bit j of plane word w = position ``w + j * nw``.
    """
    rr = nw // LANES
    n_tot = 32 * nw
    buf = jnp.concatenate(
        [halo, block, right, jnp.zeros((n_tot - n_real,), jnp.uint8)]
    )
    planes = bitplane._to_planes(buf, nw)  # (8, nw) flat word order
    pos = (
        jnp.arange(32, dtype=jnp.int32)[:, None] * nw
        + jnp.arange(nw, dtype=jnp.int32)[None, :]
    )
    vplane = bitplane._pack_mask((pos >= H - avail) & (pos < H + valid_ext))
    pv = jnp.concatenate([planes, vplane[None, :]], axis=0)  # (9, nw)
    return pv.reshape(9, LANES, rr).transpose(0, 2, 1)


def find_matches_bitplane_pallas(
    block: jnp.ndarray,
    halo: jnp.ndarray,
    right: jnp.ndarray,
    avail: jnp.ndarray,
    valid_ext: jnp.ndarray,
    *,
    la: int,
    sb: int,
    interpret: bool = False,
    record_offsets: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Same contract as ``ops.match.find_matches_brute`` (Pallas bit-plane).

    ``record_offsets=False`` is a MEASUREMENT-ONLY variant: it runs the
    identical sweep minus all first-touch offset machinery and returns
    O = 1 sentinels — the measured upper bound for any lengths-only +
    offset-recovery redesign (docs/ROOFLINE.md).  Never used by the codec.
    """
    B = block.shape[0]
    depth = spec.len_limit(la)
    dlim = spec.d_limit(sb)
    if dlim == 0 or depth == 0:
        z = jnp.zeros((B,), jnp.int32)
        return z, z
    H = halo.shape[0]
    if H != dlim:
        raise ValueError(
            f"bitplane matcher requires halo size == d_limit ({dlim}), got {H}"
        )
    R = right.shape[0]

    n_real = H + B + R
    nw = -(-n_real // 32)
    nw += (-nw) % LANES
    n_tot = 32 * nw
    rr = nw // LANES
    dbits_v = max(dlim.bit_length(), 6)
    # VMEM budget: the per-(distance-bit x length) first-touch planes
    # (dbits * depth) dominate at large depth; past ~la 40 at the default
    # window they exceed the core's VMEM, so those shapes take the XLA
    # bit-plane formulation (same algorithm, HBM-carried state).
    scratch_planes = 9 + 3 * depth + dbits_v * depth + dbits_v
    scratch_bytes = (scratch_planes + 2 * 32) * rr * LANES * 4
    if rr <= depth or scratch_bytes > VMEM_BUDGET_BYTES:
        # Too few word-rows for the run-mask row shifts (tiny block or
        # window), or sweep state over VMEM: the XLA bit-plane handles
        # these shapes for any la.
        return bitplane.find_matches_bitplane(
            block, halo, right, avail, valid_ext, la=la, sb=sb
        )

    pv_cm = _prep_planes(
        block, halo, right, avail, valid_ext, nw=nw, H=H, n_real=n_real
    )[None]

    dbits = max(dlim.bit_length(), 6)
    n_windows = -(-dlim // 32)

    kernel = functools.partial(
        _kernel, depth=depth, dlim=dlim, dbits=dbits, n_windows=n_windows,
        H=H, nw=nw, rr=rr, record_offsets=record_offsets,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(
                (1, 9, rr, LANES), lambda j, *_: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 32, rr, LANES), lambda j, *_: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 32, rr, LANES), lambda j, *_: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((9, rr, LANES), jnp.int32),
            pltpu.VMEM((depth, rr, LANES), jnp.int32),
            pltpu.VMEM((depth, rr, LANES), jnp.int32),
            pltpu.VMEM((dbits * depth, rr, LANES), jnp.int32),
            pltpu.VMEM((dbits, rr, LANES), jnp.int32),
            pltpu.VMEM((depth, rr, LANES), jnp.int32),
        ],
    )
    scal = jnp.asarray(valid_ext, jnp.int32).reshape(1)
    l_cm, o_cm = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, 32, rr, LANES), jnp.int32),
            jax.ShapeDtypeStruct((1, 32, rr, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(scal, pv_cm)

    # element (j, r, c) = position c*rr + r + j*nw -> flat strided order
    L = l_cm.reshape(32, rr, LANES).transpose(0, 2, 1).reshape(-1)[H : H + B]
    O = o_cm.reshape(32, rr, LANES).transpose(0, 2, 1).reshape(-1)[H : H + B]
    return L, O
