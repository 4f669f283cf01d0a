"""Parallel token-replay decode.

The reference decoder is a byte-serial loop — each copied byte may be the
source of the next (lz77.c:178-188).  We re-express it as data-parallel
pointer chasing (SURVEY.md §7 insight 3):

  1. output positions of every token = exclusive cumsum of (len + 1);
  2. every output byte is either a literal (value known) or a copy of the
     byte ``off`` positions earlier — a parent pointer;
  3. pointer doubling collapses every copy chain to its literal root in
     log2(n) gathers, handling overlapping (off < len) runs for free.

Works for any conforming stream — including ones produced by the C encoder —
because token bit offsets are affine and the copy semantics depend only on
absolute output positions, not on the reference's ring-buffer recycling.
"""

from __future__ import annotations

import jax.numpy as jnp


def decode_tokens(
    off: jnp.ndarray,
    ln: jnp.ndarray,
    nxt: jnp.ndarray,
    count: jnp.ndarray,
    prev_tail: jnp.ndarray,
    *,
    la: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Decode a chunk of tokens given the tail of already-decoded output.

    Args:
      off, ln, nxt: (T,) int32 token fields (padded past ``count``).
      count: scalar int32 — number of valid tokens.
      prev_tail: (H,) uint8 — last H decoded bytes before this chunk,
        tail-aligned (prev_tail[-1] is the byte immediately preceding this
        chunk's output).  H must be >= the largest representable offset.
      la: static lookahead parameter (bounds per-token output to ``la``).

    Returns:
      (out, out_len): out is (T * la,) uint8 with the first out_len bytes
      valid.
    """
    T = off.shape[0]
    H = prev_tail.shape[0]
    OUT = T * la
    W = H + OUT

    tok = jnp.arange(T, dtype=jnp.int32)
    valid = tok < count
    sz = jnp.where(valid, ln + 1, 0)
    ends = jnp.cumsum(sz)
    starts = ends - sz  # exclusive cumsum
    out_len = ends[T - 1] if T > 0 else jnp.int32(0)

    # Which token covers each output byte: +1 at every token start, cumsum.
    ind = jnp.zeros((W + 1,), jnp.int32).at[
        jnp.where(valid, H + starts, W)
    ].add(jnp.where(valid, 1, 0), mode="drop")
    tok_of = jnp.cumsum(ind)[:W] - 1
    tclamp = jnp.clip(tok_of, 0, T - 1)

    w = jnp.arange(W, dtype=jnp.int32)
    start_w = H + starts[tclamp]
    delta = w - start_w
    is_lit = delta == ln[tclamp]
    in_prev = w < H
    ptr = jnp.where(in_prev | is_lit, w, w - off[tclamp])
    ptr = jnp.clip(ptr, 0, W - 1)

    val = jnp.zeros((W,), jnp.uint8)
    if H > 0:
        val = val.at[:H].set(prev_tail)
    lit_pos = jnp.where(valid, H + starts + ln, W)
    val = val.at[lit_pos].set(nxt.astype(jnp.uint8), mode="drop")

    # Collapse copy chains: after k rounds every chain of length <= 2^k is
    # resolved; ceil(log2(W)) rounds resolve everything.
    rounds = max(1, (W - 1).bit_length())
    for _ in range(rounds):
        ptr = ptr[ptr]

    out = val[ptr][H:]
    return out, out_len
