"""Can the VPU sweep and the scalar-core walk co-issue in one kernel?

VERDICT r4 next #1: the fused encode runs its two stages serially — the
match sweep (~190 MB/s, pure VPU slab work) then the walk parse
(~196 MB/s, pure scalar-unit SMEM chasing) — although they occupy
different execution units.  Separate Pallas kernels can never overlap
(one TensorCore, one program at a time), so the only possible overlap is
INSIDE one kernel body: the TensorCore's scalar unit issues vector
instructions into the VPU's queue and continues; if Mosaic schedules a
dependent scalar SMEM chain into the shadow of queued vector slab ops,
a merged sweep+walk kernel could approach max(sweep, walk) instead of
sweep + walk (~1.8x).

This experiment measures that directly with calibrated proxies:

  V  — vector-only kernel: NV iterations of a sweep-window-like slab
       chain on VMEM scratch (rolls + logical ops, loop-carried).
  S  — scalar-only kernel: NS iterations of a walk-like dependent SMEM
       chain (data-dependent load -> add -> store, loop-carried).
  F  — fused-loop kernel: one loop, each iteration = one V body + k S
       steps (independent chains, same basic block — the scheduler is
       free to interleave).
  Q  — sequential-nests kernel: the V loop then the S loop in one kernel
       (tests whether queueing alone overlaps across loop nests).

Verdict rule: t_F ~ max(t_V, t_S) => co-issue works, build the merged
kernel; t_F ~ t_V + t_S => the units cannot overlap under Mosaic's
issue model and the serial fused pipeline stands (ROOFLINE.md entry).

Run (TPU): python experiments/coissue.py
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SLAB = 8          # vector slab: (SLAB, RR, 128) int32
RR = 32
LANES = 128
SCH = 2048        # scalar SMEM table size (like a walk chunk)


def _vec_body(v_scr):
    """One sweep-window-like step: rolls + xor/and/or over the slab."""
    x = v_scr[...]
    r = pltpu.roll(x, 1, 2)
    y = (x ^ r) | (x & pltpu.roll(x, 1, 1))
    v_scr[...] = y + jnp.int32(1)


def _scal_steps(s_scr, t, p, k):
    """k walk-like dependent steps: load at p, derive, store, advance."""
    for _ in range(k):
        w = s_scr[p]
        ln = lax.shift_right_logical(w, 16) & 0xFF
        s_scr[(t + SCH) % (2 * SCH)] = w | (ln << 8)
        t = t + 1
        p = (p + ln + 1) % SCH
    return t, p


def _kernel_v(out_ref, v_scr, *, nv):
    def body(i, c):
        _vec_body(v_scr)
        return c

    lax.fori_loop(0, nv, body, 0)
    out_ref[0, :, :] = v_scr[0]


def _kernel_s(seed_ref, out_ref, s_scr, *, ns, unroll):
    def init(i, c):
        s_scr[i] = seed_ref[i]
        return c

    lax.fori_loop(0, SCH, init, 0)

    def body(i, carry):
        t, p = carry
        return _scal_steps(s_scr, t, p, unroll)

    t, p = lax.fori_loop(0, ns // unroll, body, (0, 0))
    out_ref[0] = t + p


def _kernel_f(seed_ref, out_ref, out2_ref, v_scr, s_scr, *, nv, k):
    def init(i, c):
        s_scr[i] = seed_ref[i]
        return c

    lax.fori_loop(0, SCH, init, 0)

    def body(i, carry):
        t, p = carry
        _vec_body(v_scr)
        return _scal_steps(s_scr, t, p, k)

    t, p = lax.fori_loop(0, nv, body, (0, 0))
    out_ref[0, :, :] = v_scr[0]
    out2_ref[0] = t + p


def _kernel_q(seed_ref, out_ref, out2_ref, v_scr, s_scr, *, nv, ns, unroll):
    def init(i, c):
        s_scr[i] = seed_ref[i]
        return c

    lax.fori_loop(0, SCH, init, 0)

    def vbody(i, c):
        _vec_body(v_scr)
        return c

    lax.fori_loop(0, nv, vbody, 0)

    def sbody(i, carry):
        t, p = carry
        return _scal_steps(s_scr, t, p, unroll)

    t, p = lax.fori_loop(0, ns // unroll, sbody, (0, 0))
    out_ref[0, :, :] = v_scr[0]
    out2_ref[0] = t + p


def _call_v(nv):
    return pl.pallas_call(
        functools.partial(_kernel_v, nv=nv),
        out_shape=jax.ShapeDtypeStruct((1, RR, LANES), jnp.int32),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((SLAB, RR, LANES), jnp.int32)],
    )()


def _call_s(seed, ns, unroll):
    return pl.pallas_call(
        functools.partial(_kernel_s, ns=ns, unroll=unroll),
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.SMEM((2 * SCH,), jnp.int32)],
    )(seed)


def _call_f(seed, nv, k):
    return pl.pallas_call(
        functools.partial(_kernel_f, nv=nv, k=k),
        out_shape=[
            jax.ShapeDtypeStruct((1, RR, LANES), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ],
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((SLAB, RR, LANES), jnp.int32),
            pltpu.SMEM((2 * SCH,), jnp.int32),
        ],
    )(seed)


def _call_q(seed, nv, ns, unroll):
    return pl.pallas_call(
        functools.partial(_kernel_q, nv=nv, ns=ns, unroll=unroll),
        out_shape=[
            jax.ShapeDtypeStruct((1, RR, LANES), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ],
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((SLAB, RR, LANES), jnp.int32),
            pltpu.SMEM((2 * SCH,), jnp.int32),
        ],
    )(seed)


def _time(fn, *args) -> float:
    """Min-of-5 wall time of a jitted call, result fetched (tunnel-proof)."""
    jfn = jax.jit(fn)
    out = jfn(*args)
    jax.tree_util.tree_map(np.asarray, out)  # warm compile + fetch
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        out = jfn(*args)
        jax.tree_util.tree_map(np.asarray, out)
        best = min(best, time.perf_counter() - t0)
    return best


def slope(f_of_n, n1, n2) -> float:
    """Per-unit time via two sizes (fixed dispatch/tunnel cost cancels)."""
    return (f_of_n(n2) - f_of_n(n1)) / (n2 - n1)


def main():
    rng = np.random.default_rng(0)
    # seed with walk-like jumps: ln in [0, 8] -> ~5 positions per step
    ln = rng.integers(0, 9, SCH).astype(np.int32)
    seed = jnp.asarray((ln << 16) | rng.integers(0, 65536, SCH).astype(np.int32))

    # Sizes chosen so every timed call does >= ~100 ms of device work: the
    # tunnel's jitter is tens of ms, so sub-ms kernels time as pure noise
    # (the first run of this experiment produced negative slopes).
    UNROLL = 8
    NV1, NV2 = 100_000, 200_000
    NS1, NS2 = 4_000_000, 8_000_000

    def tv(nv):
        return _time(lambda: _call_v(nv))

    v_per = slope(tv, NV1, NV2)

    def ts(ns):
        return _time(lambda: _call_s(seed, ns, UNROLL))

    s_per = slope(ts, NS1, NS2)  # seconds per scalar step
    # k scalar steps per fused iteration ~ one vector body's worth
    k = max(UNROLL, int(round(v_per / s_per / UNROLL)) * UNROLL)

    def tf(nv):
        return _time(lambda: _call_f(seed, nv, k))

    def tq(nv):
        return _time(lambda: _call_q(seed, nv, nv * k, UNROLL))

    f_per = slope(tf, NV1, NV2)       # per fused iteration (1 vec + k scal)
    q_per = slope(tq, NV1, NV2)       # per sequential pair
    v_i = v_per
    s_i = s_per * k                    # k scalar steps standalone
    r = {
        "vec_body_us": v_i * 1e6,
        "scal_step_ns": s_per * 1e9,
        "scal_k_steps_us": s_i * 1e6,
        "k_scalar_steps_per_iter": k,
        "fused_iter_us": f_per * 1e6,
        "seq_nests_iter_us": q_per * 1e6,
        "sum_us": (v_i + s_i) * 1e6,
        "max_us": max(v_i, s_i) * 1e6,
        "overlap_efficiency_fused": (v_i + s_i - f_per) / min(v_i, s_i),
        "overlap_efficiency_seq": (v_i + s_i - q_per) / min(v_i, s_i),
    }
    print(json.dumps({k2: (round(v, 4) if isinstance(v, float) else v)
                      for k2, v in r.items()}))


if __name__ == "__main__":
    main()
