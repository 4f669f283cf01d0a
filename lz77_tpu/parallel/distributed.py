"""Multi-host orchestration (SURVEY.md §7 phase 3).

The reference is a single process with stdio as its only transport
(SURVEY.md §2.2); the TPU build's multi-host story is:

* ``jax.distributed.initialize`` for process-group setup (DCN);
* contiguous block-range partitioning per host — blocks only need raw input
  bytes (halo + right extension), so hosts share nothing during compute;
* per-block token counts all-gathered so every host can compute the global
  bit offsets (affine: ``32 + width * cumsum(counts)``);
* process 0 gathers the per-block payload bits and writes the single stream.

Runs degenerate-correctly in a single process (gather is the identity), and
the partitioning/offset logic is unit-tested without a cluster.
"""

from __future__ import annotations

import numpy as np

import jax

from .. import bitio, spec
from ..models import codec as codec_model


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


def encode_bytes_multihost(
    data: bytes,
    params: spec.Params | None = None,
    *,
    block_size: int = codec_model.DEFAULT_BLOCK_SIZE,
    batch_blocks: int = codec_model.DEFAULT_BATCH_BLOCKS,
    matcher: str = "sorted",
) -> bytes | None:
    """Encode with blocks partitioned across JAX processes.

    Every process encodes only its contiguous block range; per-block token
    *bit arrays* are gathered to process 0, which assembles and returns the
    stream (other processes return None).  The host-side entry-offset carry
    is handled by overlapping each host's range with the serial parse: the
    parse of range [lo, hi) needs the entry offset at block lo, which is
    derived from the previous host's exit — resolved with a lightweight
    prefix pass: each host parses its range starting from every possible
    entry in [0, la-1] is unnecessary because the matcher caps overhang at
    la-1 bytes; instead host h re-parses its first block for the entry
    received from host h-1 via the gathered exit offsets.

    Single-process behaviour is identical to ``codec.encode_bytes``.
    """
    params = params or spec.Params()
    nproc = jax.process_count()
    if nproc == 1:
        return codec_model.encode_bytes(
            data, params, block_size=block_size, batch_blocks=batch_blocks,
            matcher=matcher,
        )
    # Multi-process: not yet wired to a real cluster in this environment
    # (no multi-host hardware); the partitioning/offset helpers above are
    # exercised by unit tests, and the single-host path is the product.
    raise NotImplementedError(
        "multi-host encode requires a jax.distributed cluster; "
        "run single-process or use the sharded single-host path"
    )
