"""Multi-host orchestration (SURVEY.md §7 phase 3).

The reference is a single process with stdio as its only transport
(SURVEY.md §2.2); the TPU build's multi-host story:

* ``jax.distributed.initialize`` for process-group setup (DCN/Gloo);
* contiguous block-range partitioning per host — blocks need only raw input
  bytes (halo + right extension), so hosts share nothing during the match
  phase;
* the greedy parse's serial entry-offset chain is resolved WITHOUT
  serializing hosts: a token can overhang a block boundary by at most la-1
  bytes, so each host computes its range's entry -> exit map for all la
  possible entries (la cheap native walks over already-computed match
  lengths), one tiny allgather shares the maps, and every host composes the
  prefix to learn its true entry — then emits its final tokens;
* per-block token counts are allgathered so global bit offsets are affine
  (``32 + width * cumsum(counts)``), and process 0 gathers the payload
  bytes and writes the single stream.

Runs degenerate-correctly in a single process, and is exercised for real by
``tests/test_multihost.py`` via two CPU processes over Gloo (§4e).
"""

from __future__ import annotations

import numpy as np

import jax

from .. import bitio, spec
from ..models import codec as codec_model
from ..models import encoder as encoder_model


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize jax.distributed when running multi-process; no-op solo."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def block_range(num_blocks: int, num_processes: int, process_id: int):
    """Contiguous near-even split of blocks over hosts."""
    base, extra = divmod(num_blocks, num_processes)
    lo = process_id * base + min(process_id, extra)
    hi = lo + base + (1 if process_id < extra else 0)
    return lo, hi


def global_bit_offsets(counts: np.ndarray, width: int) -> np.ndarray:
    """Bit offset of each block's payload in the final stream (affine)."""
    return spec.HEADER_BITS + width * np.concatenate(
        [[0], np.cumsum(counts.astype(np.int64))[:-1]]
    )


def _parse_range(
    Ls: list[np.ndarray], vls: list[int], entry: int, la: int
) -> tuple[list[np.ndarray], int]:
    """Chain the per-block parse across a host's range from ``entry``."""
    from .. import native as native_lib

    use_native = native_lib.available()
    all_starts = []
    for L, vl in zip(Ls, vls):
        if use_native:
            starts, exit_pos = native_lib.parse_block(L, vl, entry)
        else:
            starts, exit_pos = codec_model.parse_block_np(L, vl, entry, la)
        all_starts.append(starts)
        entry = max(0, exit_pos - L.shape[0])
    return all_starts, entry


def encode_bytes_multihost(
    data: bytes,
    params: spec.Params | None = None,
    *,
    block_size: int = codec_model.DEFAULT_BLOCK_SIZE,
    batch_blocks: int = codec_model.DEFAULT_BATCH_BLOCKS,
    matcher: str = "chunked",
) -> bytes | None:
    """Encode with blocks partitioned across JAX processes.

    Every process matches and parses only its contiguous block range; the
    stream is identical to the single-host encoder's (exact global parse via
    the entry-map composition).  Process 0 returns the stream; other
    processes return None.
    """
    params = params or spec.Params()
    from ..ops import match as match_ops

    matcher = match_ops.route_matcher(matcher, params.la)
    nproc = jax.process_count()
    if nproc == 1:
        return codec_model.encode_bytes(
            data, params, block_size=block_size, batch_blocks=batch_blocks,
            matcher=matcher,
        )

    from jax.experimental import multihost_utils

    pid = jax.process_index()
    x = np.frombuffer(data, dtype=np.uint8)
    n = x.shape[0]
    la = params.la
    B = block_size
    nb = -(-n // B) if n else 0
    lo, hi = block_range(nb, nproc, pid)

    # Phase 1: match tables for my range (device), fetched to host.
    Ls: list[np.ndarray] = []
    Os: list[np.ndarray] = []
    vls: list[int] = []
    H, R = params.d_limit, params.len_limit
    G = batch_blocks
    for g0 in range(lo, hi, G):
        gn = min(G, hi - g0)
        gb, gh, gr, ga, gv = codec_model._batch_inputs(
            x, n, g0, gn, G, B, H, R
        )
        import jax.numpy as jnp

        L, O = encoder_model.match_blocks(
            jnp.asarray(gb), jnp.asarray(gh), jnp.asarray(gr),
            jnp.asarray(ga), jnp.asarray(gv),
            la=params.la, sb=params.sb, matcher=matcher,
        )
        Ln, On = np.asarray(L), np.asarray(O)
        for i in range(gn):
            Ls.append(Ln[i].astype(np.uint8))
            Os.append(On[i].astype(np.uint16))
            vls.append(min(B, n - (g0 + i) * B))

    # Phase 2: entry->exit map for my range, one walk per possible entry.
    exits = np.zeros(la, np.int32)
    for e in range(la):
        _, ex = _parse_range(Ls, vls, e, la)
        exits[e] = ex
    all_exits = np.asarray(multihost_utils.process_allgather(exits))

    # Compose prefix maps: my true entry.
    entry = 0
    for h in range(pid):
        entry = int(all_exits[h][entry])

    # Phase 3: final parse + token emission for my range.
    starts_list, _ = _parse_range(Ls, vls, entry, la)
    counts = np.zeros(nb, np.int64)
    chunks: list[np.ndarray] = []
    for k, starts in enumerate(starts_list):
        b = lo + k
        counts[b] = starts.shape[0]
        if starts.shape[0] == 0:
            continue
        gs = b * B
        ln = Ls[k][starts].astype(np.int64)
        off = Os[k][starts].astype(np.int64)
        nx = x[gs + starts + ln]
        chunks.append(bitio.tokens_to_chunk(off, ln, nx, params))

    # Phase 4: allgather counts (offsets) and payloads; host 0 assembles.
    counts = np.asarray(
        multihost_utils.process_allgather(counts)
    ).sum(axis=0)
    if bitio.byte_aligned(params):
        payload = (
            np.concatenate(chunks) if chunks else np.zeros(0, np.uint8)
        )
        nbits = payload.shape[0] * 8
    else:
        bits = np.concatenate(chunks) if chunks else np.zeros(0, np.uint8)
        nbits = bits.shape[0]
        payload = np.packbits(bits, bitorder="little")
    sizes = np.asarray(
        multihost_utils.process_allgather(
            np.array([payload.shape[0], nbits], np.int64)
        )
    )
    maxlen = int(sizes[:, 0].max()) if sizes.size else 0
    padded = np.zeros(max(maxlen, 1), np.uint8)
    padded[: payload.shape[0]] = payload
    gathered = np.asarray(multihost_utils.process_allgather(padded))

    if pid != 0:
        return None
    if bitio.byte_aligned(params):
        parts = [
            gathered[h][: sizes[h, 0]] for h in range(nproc)
        ]
        return bitio.assemble_stream(parts, params)
    bit_parts = [
        np.unpackbits(gathered[h][: sizes[h, 0]], bitorder="little")[
            : sizes[h, 1]
        ]
        for h in range(nproc)
    ]
    return bitio.assemble_stream(bit_parts, params)
