"""File-level codec: block decomposition, batching, stream assembly.

Encode path (SURVEY.md §7 phases 1-2):

  input bytes -> fixed-size blocks (+ halo of preceding and la-1 following
                 input bytes)
             -> batched device match tables (the O(n * sb) hot phase,
                jit + vmap, embarrassingly parallel)
             -> host global greedy parse: per-block pointer-doubling orbit
                with an entry-offset carry chaining blocks (O(n) gathers)
             -> host bit-pack of each block's tokens (affine offsets)
             -> single concatenated stream: header + tokens + padding.

Because every block's match table sees the true preceding bytes (halo) and
following bytes (right extension), per-position results are identical to a
single serial pass, and the entry-carried parse is *exactly* the global
greedy parse: the emitted stream is byte-identical to the numpy executable
spec and its token count is <= the reference BST encoder's (SURVEY.md §2.4).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from .. import bitio, spec
from . import decoder as decoder_model
from . import encoder as encoder_model

DEFAULT_BLOCK_SIZE = 1 << 16
DEFAULT_BATCH_BLOCKS = 8


@dataclasses.dataclass
class EncodeStats:
    """Per-run observability record (the reference has none — SURVEY.md §5)."""

    input_bytes: int = 0
    output_bytes: int = 0
    tokens: int = 0
    blocks: int = 0

    @property
    def ratio(self) -> float:
        return self.output_bytes / self.input_bytes if self.input_bytes else 0.0


def _orbit_np(J: np.ndarray, entry: int, steps: int) -> np.ndarray:
    """S[i] = f^i(entry) for i in [0, steps], via pointer doubling."""
    S = np.zeros(steps + 1, np.int64)
    S[0] = entry
    m = 1
    Jm = J
    while m <= steps:
        span = min(m, steps + 1 - m)
        S[m : m + span] = Jm[S[:span]]
        Jm = Jm[Jm]
        m *= 2
    return S


def parse_block_np(
    L: np.ndarray, valid_len: int, entry: int, la: int
) -> tuple[np.ndarray, int]:
    """Host-side greedy parse of one block: (token starts, exit position).

    Mirrors ``ops.parse.greedy_parse`` (same orbit, numpy): jump table
    f(p) = p + L[p] + 1 below ``valid_len``, fixpoints at/after it.
    """
    B = L.shape[0]
    BE = B + la
    pos = np.arange(BE, dtype=np.int64)
    Lp = np.concatenate([L.astype(np.int64), np.zeros(la, np.int64)])
    J = np.where(pos < valid_len, np.minimum(pos + Lp + 1, BE - 1), pos)
    if entry >= valid_len:
        return np.zeros(0, np.int64), entry
    S = _orbit_np(J, entry, B)
    starts = S[:B][S[:B] < valid_len]
    return starts, int(S[B])


def encode_bytes(
    data: bytes,
    params: spec.Params | None = None,
    *,
    block_size: int = DEFAULT_BLOCK_SIZE,
    batch_blocks: int = DEFAULT_BATCH_BLOCKS,
    matcher: str = "sorted",
    stats: EncodeStats | None = None,
    match_fn=None,
) -> bytes:
    """Compress ``data`` into a complete reference-format stream.

    ``match_fn`` optionally overrides the device match phase (same signature
    as ``encoder.match_blocks`` minus the static kwargs); the parallel and
    native backends plug in here.
    """
    params = params or spec.Params()
    x = np.frombuffer(data, dtype=np.uint8)
    n = x.shape[0]
    if stats is not None:
        stats.input_bytes = n

    if n == 0:
        stream = bitio.build_stream(
            np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0, np.int64),
            params,
        )
        if stats is not None:
            stats.output_bytes = len(stream)
        return stream

    B = block_size
    H = params.d_limit
    R = params.len_limit  # la - 1 bytes of right extension
    la = params.la
    nb = -(-n // B)
    G = batch_blocks

    if match_fn is None:
        def match_fn(gb, gh, gr, ga, gv):
            return encoder_model.match_blocks(
                jnp.asarray(gb), jnp.asarray(gh), jnp.asarray(gr),
                jnp.asarray(ga), jnp.asarray(gv),
                la=params.la, sb=params.sb, matcher=matcher,
            )

    bit_chunks: list[np.ndarray] = []
    total_tokens = 0
    entry = 0
    for g0 in range(0, nb, G):
        gn = min(G, nb - g0)
        gb = np.zeros((G, B), np.uint8)
        gh = np.zeros((G, H), np.uint8)
        gr = np.zeros((G, R), np.uint8)
        ga = np.zeros(G, np.int32)
        gv = np.zeros(G, np.int32)
        for i in range(gn):
            b = g0 + i
            gs = b * B
            seg = x[gs : min(gs + B, n)]
            gb[i, : seg.shape[0]] = seg
            a = min(H, gs)
            if a > 0:
                gh[i, H - a :] = x[gs - a : gs]
            rseg = x[gs + B : min(gs + B + R, n)]
            gr[i, : rseg.shape[0]] = rseg
            ga[i] = a
            gv[i] = min(B + R, n - gs)
        Lg, Og = match_fn(gb, gh, gr, ga, gv)
        Lg, Og = np.asarray(Lg), np.asarray(Og)

        for i in range(gn):
            b = g0 + i
            gs = b * B
            vl = min(B, n - gs)
            starts, exit_pos = parse_block_np(Lg[i], vl, entry, la)
            entry = max(0, exit_pos - B)
            if starts.shape[0]:
                off = Og[i][starts]
                ln = Lg[i][starts]
                nx = x[gs + starts + ln]
                total_tokens += starts.shape[0]
                bit_chunks.append(bitio.tokens_to_bits(off, ln, nx, params))

    if stats is not None:
        stats.tokens = total_tokens
        stats.blocks = nb
    stream = bitio.concat_token_bits(bit_chunks, params)
    if stats is not None:
        stats.output_bytes = len(stream)
    return stream


def decode_bytes(data: bytes) -> bytes:
    """Decompress a complete reference-format stream."""
    return decoder_model.decode_stream(data)
