"""shard_map block-parallel encode (single-host, multi-chip).

Two sharded pipelines over a (data, win) mesh (``parallel.mesh``):

* :func:`sharded_match_fn` — the production path: shards the batched match
  phase over the ``data`` axis (blocks are independent given their halos) and
  optionally splits each block's distance search over the ``win`` axis,
  recombining partial bests with a max-reduce over ICI.  Plugs into
  ``models.codec.encode_bytes(match_fn=...)``, so the host-side global parse
  (and the size <= reference guarantee) is unchanged.

* :func:`make_sharded_pipeline_step` — a fully fused device step
  (match + parse + gather on device, per-block entry=0) used by the
  multi-chip dry-run and as the template for future all-device streaming.

The reference has no analog — it is strictly single-threaded (SURVEY.md
§2.2); these are the DP and SP axes of the TPU build.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from .. import spec
from ..ops import match as match_ops
from ..ops import parse as parse_ops
from . import mesh as mesh_lib


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def sharded_match_fn(mesh, params: spec.Params, *, matcher: str = "sorted"):
    """Build a ``match_fn`` for ``codec.encode_bytes`` sharded over ``mesh``.

    The batch of G blocks is split along the ``data`` axis; when the mesh has
    a non-trivial ``win`` axis, each member scans a distance sub-range with
    the brute matcher and partial results are pmax-combined.
    """
    la, sb = params.la, params.sb
    dlim = params.d_limit
    n_win = mesh.shape[mesh_lib.WIN_AXIS]

    if n_win == 1:

        def local(blocks, halos, rights, avails, valid_exts):
            find = match_ops.get_matcher(matcher)
            fn = functools.partial(find, la=la, sb=sb)
            return jax.vmap(fn)(blocks, halos, rights, avails, valid_exts)

        specs_in = (
            P(mesh_lib.DATA_AXIS), P(mesh_lib.DATA_AXIS), P(mesh_lib.DATA_AXIS),
            P(mesh_lib.DATA_AXIS), P(mesh_lib.DATA_AXIS),
        )
        specs_out = (P(mesh_lib.DATA_AXIS), P(mesh_lib.DATA_AXIS))
    else:
        per = _cdiv(dlim, n_win)

        def local(blocks, halos, rights, avails, valid_exts):
            w = lax.axis_index(mesh_lib.WIN_AXIS)
            d_lo = 1 + w * per
            d_hi = jnp.minimum(dlim + 1, d_lo + per)
            fn = functools.partial(
                match_ops.find_matches_brute_range, la=la, sb=sb
            )
            L, O = jax.vmap(
                lambda b, h, r, a, v: fn(b, h, r, a, v, d_lo, d_hi)
            )(blocks, halos, rights, avails, valid_exts)
            key = match_ops.combine_key(L, O, dlim)
            key = lax.pmax(key, mesh_lib.WIN_AXIS)
            return match_ops.split_key(key, dlim)

        specs_in = (
            P(mesh_lib.DATA_AXIS), P(mesh_lib.DATA_AXIS), P(mesh_lib.DATA_AXIS),
            P(mesh_lib.DATA_AXIS), P(mesh_lib.DATA_AXIS),
        )
        specs_out = (P(mesh_lib.DATA_AXIS), P(mesh_lib.DATA_AXIS))

    step = jax.jit(
        jax.shard_map(
            local, mesh=mesh, in_specs=specs_in, out_specs=specs_out,
            check_vma=False,
        )
    )

    n_data = mesh.shape[mesh_lib.DATA_AXIS]

    def match_fn(gb, gh, gr, ga, gv):
        G = gb.shape[0]
        if G % n_data:
            raise ValueError(
                f"batch_blocks={G} must be a multiple of data-axis size "
                f"{n_data}"
            )
        return step(
            jnp.asarray(gb), jnp.asarray(gh), jnp.asarray(gr),
            jnp.asarray(ga), jnp.asarray(gv),
        )

    return match_fn


def make_sharded_pipeline_step(
    mesh, params: spec.Params, *, matcher: str = "brute"
):
    """Fully fused device step: blocks -> (off, len, next, counts) sharded.

    Per-block parse with entry=0 (block-aligned token starts): the stream is
    still exactly reference-format-valid; only the size <= reference
    guarantee needs the entry-carried host parse, which the production path
    keeps.  This step exists to exercise the full tp/dp-style sharding in
    one jitted computation (the multi-chip dry-run target).
    """
    la, sb = params.la, params.sb
    dlim = params.d_limit
    n_win = mesh.shape[mesh_lib.WIN_AXIS]
    per = _cdiv(max(dlim, 1), n_win)

    def local(blocks, halos, rights, avails, valid_exts):
        w = lax.axis_index(mesh_lib.WIN_AXIS)
        d_lo = 1 + w * per
        d_hi = jnp.minimum(dlim + 1, d_lo + per)

        def one(block, halo, rightx, avail, valid_ext):
            B = block.shape[0]
            L, O = match_ops.find_matches_brute_range(
                block, halo, rightx, avail, valid_ext, d_lo, d_hi,
                la=la, sb=sb,
            )
            key = match_ops.combine_key(L, O, dlim)
            key = lax.pmax(key, mesh_lib.WIN_AXIS)
            L, O = match_ops.split_key(key, dlim)
            # Block-aligned mode: every token must end inside its block
            # (entry is always 0), so clamp lengths at the block boundary.
            pos = jnp.arange(B, dtype=jnp.int32)
            L = jnp.maximum(jnp.minimum(L, B - pos - 1), 0)
            vl = jnp.minimum(valid_ext, B)
            starts, count, _ = parse_ops.greedy_parse(L, vl, 0, la=la)
            block_ext = jnp.concatenate([block, rightx])
            off, ln, nxt = parse_ops.gather_tokens(
                starts, vl, L, O, block_ext, la=la
            )
            return off, ln, nxt, count

        return jax.vmap(one)(blocks, halos, rights, avails, valid_exts)

    d = mesh_lib.DATA_AXIS
    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(d), P(d), P(d), P(d), P(d)),
            out_specs=(P(d), P(d), P(d), P(d)),
            check_vma=False,
        )
    )
