"""Exact longest-match finders (JAX device ops).

Replaces the reference's binary-search-tree match finder (tree.c:118-152),
which returns only the longest match *on one root-to-leaf path*.  Both
implementations here compute the **true** longest match for every position in
a block simultaneously, which dominates the BST's answer byte-for-byte and
therefore guarantees compressed size <= the reference's (SURVEY.md §2.4) —
while being embarrassingly parallel instead of pointer-chasing.

Two exact algorithms (identical outputs, cross-checked in tests):

* ``find_matches_brute``: sweep over distances d=1..d_limit; for each d a
  vectorized cumulative-AND over the lookahead depth gives the run length at
  every position at once.  O(n * d_limit * la) elementwise work, perfectly
  regular — no data-dependent pathology (the reference's degenerate BST is
  47x slower on runs; this is shape-invariant).

* ``find_matches_sorted``: for each k in 1..la-1, sort positions by their
  k-gram; the predecessor with an equal gram is the *nearest* previous
  occurrence, and L[p] = max{k : nearest k-gram occurrence within window}.
  d_limit-independent — preferred for large windows.

Coordinates: a block of B bytes is processed with an H-byte *halo* of
preceding input bytes prepended (H = d_limit) and an (la-1)-byte *right
extension* of following input bytes appended, so both match distances and
lookahead depth see exactly the same bytes a single serial pass over the
whole input would (the reference's sliding window, lz77.c:113-129).  The
per-position results are therefore block-size-invariant — the foundation of
the size <= reference guarantee.  ``avail`` is the number of valid halo
bytes (< H only near the start of the stream); ``valid_ext`` is the number
of valid bytes counting from block[0], possibly exceeding B.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from .. import spec

_BIG = jnp.int32(1 << 30)


def _shift_stack(buf: jnp.ndarray, depth: int) -> jnp.ndarray:
    """SH[i, t] = buf[t + i] for i in [0, depth); zero-padded past the end."""
    n = buf.shape[0]
    ext = jnp.concatenate([buf, jnp.zeros((depth,), buf.dtype)])
    return jnp.stack(
        [lax.dynamic_slice(ext, (i,), (n,)) for i in range(depth)]
    )


def find_matches_brute(
    block: jnp.ndarray,
    halo: jnp.ndarray,
    right: jnp.ndarray,
    avail: jnp.ndarray,
    valid_ext: jnp.ndarray,
    *,
    la: int,
    sb: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """True longest match per position via distance sweep.

    Args:
      block: (B,) uint8 — block bytes (padded with zeros past validity).
      halo: (H,) uint8 — the H input bytes preceding the block, tail-aligned
        (halo[-1] is the byte immediately before block[0]).
      right: (la-1,) uint8 — input bytes following the block (zeros at EOF).
      avail: scalar int32 — number of valid bytes at the tail of ``halo``.
      valid_ext: scalar int32 — valid input bytes counting from block[0]
        (includes the right extension; may exceed B).
      la, sb: static codec parameters.

    Returns:
      (L, O): (B,) int32 each.  L[p] in [0, la-1], capped at
      ``min(la, valid_ext - p) - 1`` so the token's ``next`` byte is always
      real (lookahead shrinkage, lz77.c:87,134); O[p] is the smallest
      distance achieving L[p], 0 when L[p] == 0.
    """
    B = block.shape[0]
    depth = spec.len_limit(la)
    dlim = spec.d_limit(sb)
    pos = jnp.arange(B, dtype=jnp.int32)
    cap = jnp.minimum(depth, valid_ext - pos - 1)

    if dlim == 0 or depth == 0:
        z = jnp.zeros((B,), jnp.int32)
        return z, z

    buf = jnp.concatenate([halo, block, right])  # (H + B + la-1,)
    H = halo.shape[0]
    SH = _shift_stack(buf, depth)  # (depth, H+B+R)
    X = SH[:, H : H + B]  # X[i, p] = block-coordinate byte p + i

    def body(d, carry):
        best_l, best_o = carry
        S = lax.dynamic_slice(SH, (0, H - d), (depth, B))
        runs = jnp.cumprod((X == S).astype(jnp.int32), axis=0).sum(axis=0)
        runs = jnp.minimum(runs, cap)
        runs = jnp.where(d <= pos + avail, runs, -1)
        upd = runs > best_l
        return (
            jnp.where(upd, runs, best_l),
            jnp.where(upd, d, best_o),
        )

    zeros = jnp.zeros((B,), jnp.int32)
    L, O = lax.fori_loop(1, dlim + 1, body, (zeros, zeros))
    return L, O


def _pack_grams(shifts: jnp.ndarray, k: int) -> list[jnp.ndarray]:
    """Pack the k leading shifted byte rows into ceil(k/4) int32 key words."""
    words = []
    for w in range((k + 3) // 4):
        acc = jnp.zeros((shifts.shape[1],), jnp.int32)
        for j in range(4):
            i = w * 4 + j
            if i < k:
                acc = acc | (shifts[i].astype(jnp.int32) << (8 * j))
        words.append(acc)
    return words


def find_matches_sorted(
    block: jnp.ndarray,
    halo: jnp.ndarray,
    right: jnp.ndarray,
    avail: jnp.ndarray,
    valid_ext: jnp.ndarray,
    *,
    la: int,
    sb: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """True longest match per position via per-k-gram sorting.

    Same contract as :func:`find_matches_brute`.  For each k the nearest
    previous equal k-gram is found by sorting (gram, position) and taking the
    in-order predecessor; validity of k implies validity of k-1 (its prefix
    matches at the same distance), so L is the count of valid k and the
    offset is the nearest occurrence distance at k = L.
    """
    B = block.shape[0]
    H = halo.shape[0]
    depth = spec.len_limit(la)
    dlim = spec.d_limit(sb)
    pos = jnp.arange(B, dtype=jnp.int32)
    cap = jnp.minimum(depth, valid_ext - pos - 1)
    limit = jnp.minimum(dlim, pos + avail)

    if dlim == 0 or depth == 0:
        z = jnp.zeros((B,), jnp.int32)
        return z, z

    buf = jnp.concatenate([halo, block, right])
    N = buf.shape[0]
    SH = _shift_stack(buf, depth)  # (depth, N)
    t = jnp.arange(N, dtype=jnp.int32)

    dists = []
    for k in range(1, depth + 1):
        words = _pack_grams(SH, k)
        sorted_ops = lax.sort(tuple(words) + (t,), num_keys=len(words) + 1)
        ps = sorted_ops[-1]
        same = jnp.ones((N,), bool)
        for w in sorted_ops[:-1]:
            same = same & (w == jnp.roll(w, 1))
        same = same.at[0].set(False)
        cand = jnp.where(same, ps - jnp.roll(ps, 1), _BIG)
        D = jnp.zeros((N,), jnp.int32).at[ps].set(cand)
        dists.append(D[H : H + B])  # distances for block positions only

    Dk = jnp.stack(dists)  # (depth, B)
    ks = jnp.arange(1, depth + 1, dtype=jnp.int32)[:, None]
    valid_k = (Dk <= limit[None, :]) & (ks <= cap[None, :])
    L = valid_k.astype(jnp.int32).sum(axis=0)  # monotone in k
    O = jnp.take_along_axis(
        Dk, jnp.maximum(L - 1, 0)[None, :], axis=0
    )[0]
    O = jnp.where(L > 0, O, 0)
    return L, O


def find_matches_chunked(
    block: jnp.ndarray,
    halo: jnp.ndarray,
    right: jnp.ndarray,
    avail: jnp.ndarray,
    valid_ext: jnp.ndarray,
    *,
    la: int,
    sb: int,
    chunk: int = 128,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """True longest match per position, distance-chunked for the VPU.

    Same contract as :func:`find_matches_brute`, reorganized for TPU
    efficiency: distances are processed in chunks of 128.  Per chunk, ONE
    unaligned dynamic slice of the byte buffer yields a vector from which
    all 128 shifted candidate rows are *statically* sliced — so the hot loop
    is 32 iterations of large regular (128, B) elementwise tensors instead
    of 4095 iterations of per-distance unaligned slices.  Match lengths come
    from run-length doubling along the position axis (log2(la) static
    shifts), and the best (length, smallest distance) is kept via an
    order-preserving scalar key and a row max-reduce.
    """
    B = block.shape[0]
    depth = spec.len_limit(la)
    dlim = spec.d_limit(sb)
    pos = jnp.arange(B, dtype=jnp.int32)
    cap = jnp.minimum(depth, valid_ext - pos - 1)

    if dlim == 0 or depth == 0:
        z = jnp.zeros((B,), jnp.int32)
        return z, z

    H = halo.shape[0]
    if H != dlim:
        raise ValueError(
            f"chunked matcher requires halo size == d_limit ({dlim}), got {H}"
        )
    # Byte buffer in int8 lanes; pad left so chunk slices never underflow.
    buf = jnp.concatenate([jnp.zeros((chunk,), jnp.uint8), halo, block, right])
    NB = buf.shape[0]
    x = block
    n_chunks = -(-dlim // chunk)

    # Run-length doubling needs eq at p + 1, 2, 4, 8; extend by `ext`.
    ext = 1
    while ext < depth:
        ext <<= 1
    # Lookahead extension past the block uses the REAL following bytes
    # (right), zeros only beyond; cap clamps validity at valid_ext.
    xr = jnp.concatenate([x, right])
    x_ext = jnp.concatenate(
        [xr, jnp.zeros((max(0, B + ext - xr.shape[0]),), jnp.uint8)]
    )[: B + ext]
    pad_buf = jnp.concatenate([buf, jnp.zeros((ext,), jnp.uint8)])

    key0 = jnp.zeros((B,), jnp.int32)
    kmul = dlim + 2

    def body(dc, best):
        # z[t] = buf[chunk + H + t - (dc*chunk + chunk - 1)] for t in
        # [0, B + ext + chunk): row r then selects d = dc*chunk + r + 1.
        start = chunk + H - (dc + 1) * chunk
        z = lax.dynamic_slice(pad_buf, (start,), (B + ext + chunk,))
        # S[r, p] = x[p - (dc*chunk + r + 1)]: static shifts of z.
        S = jnp.stack(
            [
                lax.dynamic_slice(z, (chunk - 1 - r,), (B + ext,))
                for r in range(chunk)
            ]
        )  # (chunk, B + ext)
        rl_dtype = jnp.int8 if depth <= 63 else jnp.int16
        eq = (S == x_ext[None, :]).astype(rl_dtype)  # (chunk, B+ext)
        # Capped run length via doubling: rl[p] = min(run, 2m) per step.
        rl = eq
        m = 1
        while m < depth:
            shifted = jnp.concatenate(
                [rl[:, m:], jnp.zeros((chunk, m), rl_dtype)], axis=1
            )
            rl = rl + jnp.where(rl == m, shifted, 0)
            m <<= 1
        runs = jnp.minimum(rl[:, :B].astype(jnp.int32), cap[None, :])
        d = dc * chunk + jnp.arange(1, chunk + 1, dtype=jnp.int32)[:, None]
        ok = (d <= dlim) & (d <= (pos + avail)[None, :]) & (runs > 0)
        key = jnp.where(ok, runs * kmul + (dlim + 1 - d), 0)
        return jnp.maximum(best, key.max(axis=0))

    best = lax.fori_loop(0, n_chunks, body, key0)
    L = best // kmul
    O = jnp.where(L > 0, (dlim + 1) - best % kmul, 0)
    return L, O


def find_matches_brute_range(
    block: jnp.ndarray,
    halo: jnp.ndarray,
    right: jnp.ndarray,
    avail: jnp.ndarray,
    valid_ext: jnp.ndarray,
    d_lo: jnp.ndarray,
    d_hi: jnp.ndarray,
    *,
    la: int,
    sb: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Distance-sweep matcher over a sub-range [d_lo, d_hi) of distances.

    Building block for window-axis model parallelism: each mesh member
    searches its own distance shard and partial (L, O) results are combined
    with a max-reduce (see ``parallel.sharded``).  Bounds may be traced.
    """
    B = block.shape[0]
    depth = spec.len_limit(la)
    dlim = spec.d_limit(sb)
    pos = jnp.arange(B, dtype=jnp.int32)
    cap = jnp.minimum(depth, valid_ext - pos - 1)

    if dlim == 0 or depth == 0:
        z = jnp.zeros((B,), jnp.int32)
        return z, z

    buf = jnp.concatenate([halo, block, right])
    H = halo.shape[0]
    SH = _shift_stack(buf, depth)
    X = SH[:, H : H + B]

    def body(d, carry):
        best_l, best_o = carry
        S = lax.dynamic_slice(SH, (0, H - d), (depth, B))
        runs = jnp.cumprod((X == S).astype(jnp.int32), axis=0).sum(axis=0)
        runs = jnp.minimum(runs, cap)
        runs = jnp.where(d <= pos + avail, runs, -1)
        upd = runs > best_l
        return (
            jnp.where(upd, runs, best_l),
            jnp.where(upd, d, best_o),
        )

    zeros = jnp.zeros((B,), jnp.int32)
    lo = jnp.clip(d_lo, 1, dlim + 1)
    hi = jnp.clip(d_hi, lo, dlim + 1)
    L, O = lax.fori_loop(lo, hi, body, (zeros, zeros))
    return L, O


def combine_key(L: jnp.ndarray, O: jnp.ndarray, dlim: int) -> jnp.ndarray:
    """Order-preserving scalar key: max L wins, then smallest O."""
    return L * (dlim + 2) + (dlim + 1 - O)


def split_key(key: jnp.ndarray, dlim: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    L = key // (dlim + 2)
    O = (dlim + 1) - key % (dlim + 2)
    return L, jnp.where(L > 0, O, 0)


def _find_matches_bitplane(*args, **kw):
    from . import bitplane  # deferred to keep module import light

    return bitplane.find_matches_bitplane(*args, **kw)


MATCHERS = {
    "brute": find_matches_brute,
    "sorted": find_matches_sorted,
    "chunked": find_matches_chunked,
    "bitplane": _find_matches_bitplane,
}


def route_matcher(name: str, la: int) -> str:
    """Capability routing for matcher names.

    Round 3 removed the bit-plane family's ``la <= 33`` cap: the XLA
    bit-plane formulation is exact for any ``la`` the reference CLI accepts
    (``-l`` up to 255, main.c:35) whenever the block is large enough
    (``nw > depth`` — guaranteed by default block sizing), and it measures
    1.48x the chunked matcher at la=64 on a v5e (docs/PARITY.md).  The
    Pallas bit-plane wrapper self-routes to the XLA formulation when its
    sweep state would exceed VMEM (``pallas_bitplane.py``), so no name
    rewriting is needed any more; this hook remains for future capability
    splits."""
    return name


def get_matcher(name: str):
    if name == "pallas":
        from . import pallas_match  # deferred: pulls in pallas machinery

        return pallas_match.find_matches_pallas
    if name == "bitplane":
        from . import bitplane

        return bitplane.find_matches_bitplane
    if name == "pallas_bitplane":
        from . import pallas_bitplane

        return pallas_bitplane.find_matches_bitplane_pallas
    try:
        return MATCHERS[name]
    except KeyError:
        raise ValueError(
            f"unknown matcher {name!r}; available: "
            f"{sorted(MATCHERS) + ['pallas', 'pallas_bitplane']}"
        ) from None
