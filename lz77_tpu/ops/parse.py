"""Greedy parse as a parallel orbit computation.

The reference's encode loop walks ``p <- p + len + 1`` one token at a time
(lz77.c:89-136).  That jump chain is the only sequential dependency left in
encoding once the match table is known (SURVEY.md §7 insight 2).  We resolve
it with pointer doubling: maintain S[i] = f^i(entry) and the table of
f^(2^k); each round doubles the number of known token starts, so the whole
parse is log2(B) gathers instead of a length-T serial walk.

Because the previous block's final token may overhang into this block by up
to la-1 bytes, the parse takes an ``entry`` offset and reports its
``exit_pos`` (first chain position >= the block's token-start limit, which
lands in [B, B + la - 1] mid-stream).  Chaining entry offsets block-to-block
reproduces the exact global serial parse.  ``lz77_tpu.models.codec`` carries
the entry on the host; :func:`greedy_parse` is the device-side op.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def greedy_parse(
    L: jnp.ndarray,
    valid_len: jnp.ndarray,
    entry: jnp.ndarray | int = 0,
    *,
    la: int,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Token start positions of the greedy parse from ``entry``.

    Args:
      L: (B,) int32 match lengths (capped so p + L + 1 <= valid data end).
      valid_len: scalar int32 — token-start limit: min(block valid bytes, B).
      entry: scalar int32 in [0, la-1] — first unconsumed position.
      la: static lookahead parameter (bounds overhang past the block).

    Returns:
      (starts, count, exit_pos): starts is (B,) int32 with
      starts[i] = f^i(entry); count is the number of starts < valid_len;
      exit_pos = f^B(entry) is where the chain leaves the block (>= valid_len).
    """
    B = L.shape[0]
    BE = B + la  # chain values never exceed B-1 + (la-1) + 1 = B + la - 1
    pos = jnp.arange(BE, dtype=jnp.int32)
    Lp = jnp.concatenate([L, jnp.zeros((la,), jnp.int32)])
    # Positions >= valid_len are fixpoints: the chain parks at its exit.
    J = jnp.where(pos < valid_len, jnp.minimum(pos + Lp + 1, BE - 1), pos)

    S = jnp.full((B + 1,), 0, jnp.int32).at[0].set(entry)
    m = 1
    while m <= B:
        span = min(m, B + 1 - m)
        tail = J[S[:span]]  # f^m applied to the first `span` chain entries
        S = lax.dynamic_update_slice(S, tail, (m,))
        J = J[J]
        m *= 2
    count = (S[:B] < valid_len).sum().astype(jnp.int32)
    return S[:B], count, S[B]


def gather_tokens(
    starts: jnp.ndarray,
    valid_len: jnp.ndarray,
    L: jnp.ndarray,
    O: jnp.ndarray,
    block_ext: jnp.ndarray,
    *,
    la: int,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Materialize (off, len, next) at the parse's token starts.

    ``block_ext`` is the block plus its (la-1)-byte right extension so that
    ``next = block_ext[start + len]`` is always a real byte even when the
    final token's lookahead overhangs the block (lz77.c:221 + matcher cap).
    Outputs are (B,) arrays: real tokens first, zeroed padding after.
    """
    B = starts.shape[0]
    E = block_ext.shape[0]
    idx = jnp.minimum(starts, B - 1)
    valid = starts < valid_len
    ln = jnp.where(valid, L[idx], 0)
    off = jnp.where(valid & (ln > 0), O[idx], 0)
    nxt = jnp.where(
        valid, block_ext[jnp.minimum(idx + ln, E - 1)].astype(jnp.int32), 0
    )
    return off, ln, nxt
