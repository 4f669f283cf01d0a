"""Block encoder pipeline (device side).

Two device entry points:

* :func:`match_blocks` — the hot phase: exact match tables for a batch of
  independent blocks (jit + vmap).  Blocks depend only on raw input bytes
  (halo + right extension), so this phase is embarrassingly parallel across
  blocks, batches and devices.  The file-level codec pairs it with a global
  host-side parse that chains entry offsets, reproducing the exact serial
  parse (and therefore the size <= reference guarantee).

* :func:`encode_block` — the full single-block pipeline (match -> parse ->
  gather) fused on device; used by the compile-check entry point, tests and
  the sharded demo path where a per-block parse (entry=0) is acceptable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import match as match_ops
from ..ops import parse as parse_ops


@functools.partial(jax.jit, static_argnames=("la", "sb", "matcher"))
def match_blocks(
    blocks: jnp.ndarray,
    halos: jnp.ndarray,
    rights: jnp.ndarray,
    avails: jnp.ndarray,
    valid_exts: jnp.ndarray,
    *,
    la: int,
    sb: int,
    matcher: str = "sorted",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(G, B) blocks -> (G, B) match tables (L, O)."""
    find = match_ops.get_matcher(matcher)
    fn = functools.partial(find, la=la, sb=sb)
    return jax.vmap(fn)(blocks, halos, rights, avails, valid_exts)


def encode_block(
    block: jnp.ndarray,
    halo: jnp.ndarray,
    right: jnp.ndarray,
    avail: jnp.ndarray,
    valid_ext: jnp.ndarray,
    entry: jnp.ndarray | int = 0,
    *,
    la: int,
    sb: int,
    matcher: str = "sorted",
):
    """One block -> (off, len, next, count, exit_pos), padded to block size."""
    B = block.shape[0]
    find = match_ops.get_matcher(matcher)
    L, O = find(block, halo, right, avail, valid_ext, la=la, sb=sb)
    vl = jnp.minimum(valid_ext, B)
    starts, count, exit_pos = parse_ops.greedy_parse(L, vl, entry, la=la)
    block_ext = jnp.concatenate([block, right])
    off, ln, nxt = parse_ops.gather_tokens(
        starts, vl, L, O, block_ext, la=la
    )
    return off, ln, nxt, count, exit_pos


encode_block_jit = jax.jit(
    encode_block, static_argnames=("la", "sb", "matcher")
)
