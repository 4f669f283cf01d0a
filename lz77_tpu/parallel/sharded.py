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

* :func:`make_sharded_exact_step` — the fused step WITHOUT the entry=0
  compromise: every shard computes its blocks' entry->exit maps for all
  ``la`` possible parse entries (the same associative map-composition trick
  ``parallel.distributed`` uses across hosts), the (la,)-sized shard maps are
  all-gathered over ICI, and each shard composes the prefix locally to learn
  its true entry — so the assembled stream is byte-identical to the serial
  host parse (and keeps the size <= reference guarantee) while match, parse
  and token gather all stay on device.  :func:`encode_bytes_sharded` is the
  stream-producing wrapper.

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


# ---------------------------------------------------------------------------
# Exact entry-carried sharded step
# ---------------------------------------------------------------------------

def _entry_exit_map(L: jnp.ndarray, valid_len: jnp.ndarray, la: int):
    """(la,) int32 map: parse-exit overhang for every possible entry.

    Squaring the jump table ``p <- min(p + L[p] + 1, end)`` to its fixpoint
    gives f^inf for all positions at once (positions >= valid_len are
    fixpoints, so f^inf == f^B); entry e's exit overhang into the next block
    is ``f^inf(e) - valid_len`` in [0, la).  For a fully padded block
    (valid_len == 0) the map degenerates to the identity, passing entries
    through unchanged.
    """
    B = L.shape[0]
    BE = B + la
    pos = jnp.arange(BE, dtype=jnp.int32)
    Lp = jnp.concatenate([L.astype(jnp.int32), jnp.zeros((la,), jnp.int32)])
    J = jnp.where(
        pos < valid_len, jnp.minimum(pos + Lp + 1, BE - 1), pos
    )
    F = J
    for _ in range(max(1, (BE - 1).bit_length())):
        F = F[F]
    return jnp.clip(F[:la] - valid_len, 0, la - 1)


def _compose_maps(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a then b): combined[e] = b[a[e]] along the trailing entry axis."""
    return jnp.take_along_axis(b, a, axis=-1)


def make_sharded_exact_step(
    mesh, params: spec.Params, *, matcher: str = "sorted"
):
    """Fused sharded device step with the EXACT entry-carried global parse.

    Replaces the reference's serial token loop (lz77.c:89-136) across chips:
    the only cross-block state in the greedy parse is the entry offset in
    [0, la), so each shard derives its blocks' entry->exit maps, composes
    them locally (associative scan), all-gathers the (la,)-sized shard totals
    over the ``data`` axis (ICI), and composes the prefix to find its own
    true entry — one tiny collective instead of a serial chain.  Tokens are
    then parsed/gathered per block with the true entries, so the assembled
    stream is byte-identical to the serial host parse.

    Returns ``step(blocks, halos, rights, avails, valid_exts, entry0) ->
    (off, ln, nxt, counts, exit_entry)`` with per-block padded token arrays,
    per-block counts, and the parse entry into the next batch of blocks.
    """
    la, sb = params.la, params.sb
    dlim = params.d_limit
    n_win = mesh.shape[mesh_lib.WIN_AXIS]
    per = _cdiv(max(dlim, 1), n_win)

    def local(blocks, halos, rights, avails, valid_exts, entry0):
        Gd, B = blocks.shape

        # ---- match tables (win axis splits the distance search) ----------
        if n_win == 1:
            find = match_ops.get_matcher(matcher)
            fn = functools.partial(find, la=la, sb=sb)
            L, O = jax.vmap(fn)(blocks, halos, rights, avails, valid_exts)
        else:
            w = lax.axis_index(mesh_lib.WIN_AXIS)
            d_lo = 1 + w * per
            d_hi = jnp.minimum(dlim + 1, d_lo + per)
            fnr = functools.partial(
                match_ops.find_matches_brute_range, la=la, sb=sb
            )
            L, O = jax.vmap(
                lambda b, h, r, a, v: fnr(b, h, r, a, v, d_lo, d_hi)
            )(blocks, halos, rights, avails, valid_exts)
            key = match_ops.combine_key(L, O, dlim)
            key = lax.pmax(key, mesh_lib.WIN_AXIS)
            L, O = match_ops.split_key(key, dlim)
        L = L.astype(jnp.int32)
        O = O.astype(jnp.int32)

        # ---- entry->exit maps, composed within the shard ------------------
        vls = jnp.minimum(valid_exts.astype(jnp.int32), B)  # (Gd,)
        maps = jax.vmap(
            functools.partial(_entry_exit_map, la=la)
        )(L, vls)                                            # (Gd, la)
        P = lax.associative_scan(_compose_maps, maps, axis=0)
        shard_map_total = P[-1]                              # (la,)

        # ---- one ICI collective: compose shard maps across the data axis -
        gathered = lax.all_gather(
            shard_map_total, mesh_lib.DATA_AXIS
        )                                                    # (n_data, la)
        Pa = lax.associative_scan(_compose_maps, gathered, axis=0)
        e0 = jnp.clip(entry0.astype(jnp.int32), 0, la - 1)
        idx = lax.axis_index(mesh_lib.DATA_AXIS)
        prev = Pa[jnp.maximum(idx - 1, 0), e0]
        entry_shard = jnp.where(idx > 0, prev, e0)
        exit_entry = Pa[-1, e0]

        # ---- per-block true entries within the shard ----------------------
        if Gd > 1:
            entries = jnp.concatenate(
                [entry_shard[None], jnp.take(P[:-1], entry_shard, axis=1)]
            )
        else:
            entries = entry_shard[None]

        # ---- exact parse + token gather ------------------------------------
        def one(Lb, Ob, block, rightx, vl, e):
            starts, count, _ = parse_ops.greedy_parse(Lb, vl, e, la=la)
            block_ext = jnp.concatenate([block, rightx])
            off, ln, nxt = parse_ops.gather_tokens(
                starts, vl, Lb, Ob, block_ext, la=la
            )
            return off, ln, nxt, count

        off, ln, nxt, counts = jax.vmap(one)(
            L, O, blocks, rights, vls, entries
        )
        return off, ln, nxt, counts, exit_entry

    d = mesh_lib.DATA_AXIS
    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(d), P(d), P(d), P(d), P(d), P()),
            out_specs=(P(d), P(d), P(d), P(d), P()),
            check_vma=False,
        )
    )


def encode_bytes_sharded(
    data: bytes,
    params: spec.Params | None = None,
    *,
    mesh=None,
    block_size: int | None = None,
    batch_blocks: int | None = None,
    matcher: str = "sorted",
) -> bytes:
    """Compress via the exact sharded step; stream == serial host parse.

    Blocks are sharded over the mesh's ``data`` axis; the parse entry is
    carried across batches as a device scalar (replicated), so arbitrarily
    long inputs stream through a fixed-size compiled step.
    """
    import numpy as np

    from .. import bitio
    from ..models import codec as codec_model

    params = params or spec.Params()
    if mesh is None:
        mesh = mesh_lib.make_mesh()
    n_data = mesh.shape[mesh_lib.DATA_AXIS]
    B = block_size or codec_model.DEFAULT_BLOCK_SIZE
    G = batch_blocks or n_data
    if G % n_data:
        raise ValueError(
            f"batch_blocks={G} must be a multiple of data-axis size {n_data}"
        )
    x = np.frombuffer(data, dtype=np.uint8)
    n = x.shape[0]
    if n == 0:
        return bitio.header_bytes(params)
    H, R = params.d_limit, params.len_limit
    nblocks = _cdiv(n, B)
    num_batches = _cdiv(nblocks, G)
    step = make_sharded_exact_step(mesh, params, matcher=matcher)

    chunks: list[np.ndarray] = []
    entry = jnp.int32(0)
    for bi in range(num_batches):
        g0 = bi * G
        gn = min(G, nblocks - g0)
        gb, gh, gr, ga, gv = codec_model._batch_inputs(x, n, g0, gn, G, B, H, R)
        off, ln, nxt, counts, entry = step(
            jnp.asarray(gb), jnp.asarray(gh), jnp.asarray(gr),
            jnp.asarray(ga), jnp.asarray(gv), entry,
        )
        off_h, ln_h, nxt_h = np.asarray(off), np.asarray(ln), np.asarray(nxt)
        counts_h = np.asarray(counts)
        for i in range(gn):
            c = int(counts_h[i])
            chunks.append(
                bitio.tokens_to_bits(
                    off_h[i, :c], ln_h[i, :c], nxt_h[i, :c], params
                )
            )
    return bitio.concat_token_bits(chunks, params)
