"""File-level codec: block decomposition, batching, stream assembly.

Encode path (SURVEY.md §7 phases 1-2):

  input bytes -> fixed-size blocks (+ halo of preceding and la-1 following
                 input bytes)
             -> batched device match tables (the O(n * sb) hot phase,
                jit + vmap, embarrassingly parallel)
             -> host global greedy parse: per-block pointer-doubling orbit
                with an entry-offset carry chaining blocks (O(n) gathers)
             -> device gather of offsets at token starts
             -> host bit-pack of each block's tokens (affine offsets)
             -> single concatenated stream: header + tokens + padding.

Because every block's match table sees the true preceding bytes (halo) and
following bytes (right extension), per-position results are identical to a
single serial pass, and the entry-carried parse is *exactly* the global
greedy parse: the emitted stream is byte-identical to the numpy executable
spec and its token count is <= the reference BST encoder's (SURVEY.md §2.4).

Transfer discipline: the host<->device boundary (tunnel/PCIe) is the scarce
resource, so the device returns nibble-packed match lengths (half a byte per
input byte) and offsets are fetched only at token starts (~T*2 bytes).  A
two-deep software pipeline overlaps device matching of batch k+1 with host
parsing of batch k.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .. import bitio, spec
from ..utils import faults as faults_lib
from ..utils import metrics as metrics_lib
from . import decoder as decoder_model
from . import encoder as encoder_model

DEFAULT_BLOCK_SIZE = 1 << 16
DEFAULT_BATCH_BLOCKS = 8
_IDX_BUCKET = 1 << 14


@dataclasses.dataclass
class EncodeStats:
    """Per-run observability record (the reference has none — SURVEY.md §5)."""

    input_bytes: int = 0
    output_bytes: int = 0
    tokens: int = 0
    blocks: int = 0
    retries: int = 0
    phases: metrics_lib.PhaseTimes = dataclasses.field(
        default_factory=metrics_lib.PhaseTimes
    )

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


def _batch_inputs(x: np.ndarray, n: int, g0: int, gn: int, G: int, B: int,
                  H: int, R: int):
    gb = np.zeros((G, B), np.uint8)
    gh = np.zeros((G, H), np.uint8)
    gr = np.zeros((G, R), np.uint8)
    ga = np.zeros(G, np.int32)
    gv = np.zeros(G, np.int32)
    for i in range(gn):
        gs = (g0 + i) * B
        seg = x[gs : min(gs + B, n)]
        gb[i, : seg.shape[0]] = seg
        a = min(H, gs)
        if a > 0:
            gh[i, H - a :] = x[gs - a : gs]
        rseg = x[gs + B : min(gs + B + R, n)]
        gr[i, : rseg.shape[0]] = rseg
        ga[i] = a
        gv[i] = min(B + R, n - gs)
    return gb, gh, gr, ga, gv


def encode_bytes(
    data: bytes,
    params: spec.Params | None = None,
    *,
    block_size: int = DEFAULT_BLOCK_SIZE,
    batch_blocks: int = DEFAULT_BATCH_BLOCKS,
    matcher: str = "brute",
    stats: EncodeStats | None = None,
    match_fn=None,
    retries: int = 2,
    fault_injector: faults_lib.FaultInjector | None = None,
) -> bytes:
    """Compress ``data`` into a complete reference-format stream.

    ``match_fn`` optionally overrides the device match phase with one
    returning full (L, O) tables (the sharded backend plugs in here); the
    default path uses the transfer-minimal compact pipeline.  Failed device
    batches are retried ``retries`` times (blocks are independent up to the
    scalar entry carry, so retry is safe and cheap — SURVEY.md §5).
    """
    params = params or spec.Params()
    x = np.frombuffer(data, dtype=np.uint8)
    n = x.shape[0]
    st = stats if stats is not None else EncodeStats()
    st.input_bytes = n

    if n == 0:
        stream = bitio.build_stream(
            np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0, np.int64),
            params,
        )
        st.output_bytes = len(stream)
        return stream

    B = block_size
    if B % 2:
        raise ValueError("block_size must be even (nibble packing)")
    H = params.d_limit
    R = params.len_limit
    la = params.la
    nb = -(-n // B)
    G = batch_blocks
    num_batches = -(-nb // G)

    def submit(bi: int):
        g0 = bi * G
        gn = min(G, nb - g0)
        gb, gh, gr, ga, gv = _batch_inputs(x, n, g0, gn, G, B, H, R)
        if match_fn is not None:
            L, O = match_fn(gb, gh, gr, ga, gv)
            return ("full", bi, gn, L, O)
        packed, O16 = encoder_model.match_blocks_compact(
            jnp.asarray(gb), jnp.asarray(gh), jnp.asarray(gr),
            jnp.asarray(ga), jnp.asarray(gv),
            la=params.la, sb=params.sb, matcher=matcher,
        )
        return ("compact", bi, gn, packed, O16)

    entry = 0
    bit_chunks: list[np.ndarray] = []
    total_tokens = 0

    def process(handle):
        nonlocal entry, total_tokens
        kind, bi, gn, a1, a2 = handle
        g0 = bi * G
        if kind == "full":
            Lg, Og = np.asarray(a1), np.asarray(a2)
        else:
            packed_np = np.asarray(a1)  # the only bulk fetch: ~B/2 per block
        all_starts: list[np.ndarray] = []
        all_lens: list[np.ndarray] = []
        block_of: list[int] = []
        for i in range(gn):
            gs = (g0 + i) * B
            vl = min(B, n - gs)
            if kind == "full":
                L = Lg[i]
            else:
                L = encoder_model.unpack_lengths(packed_np[i], B, la)
            starts, exit_pos = parse_block_np(L, vl, entry, la)
            entry = max(0, exit_pos - B)
            all_starts.append(starts)
            all_lens.append(L[starts] if starts.shape[0] else
                            np.zeros(0, np.uint8))
            block_of.append(i)
        counts = [s.shape[0] for s in all_starts]
        Ttot = sum(counts)
        if Ttot == 0:
            return
        if kind == "full":
            off_cat = np.concatenate(
                [Og[i][all_starts[k]] for k, i in enumerate(block_of)]
            )
        else:
            flat = np.concatenate(
                [i * B + s for i, s in zip(block_of, all_starts)]
            ).astype(np.int32)
            pad = -(-flat.shape[0] // _IDX_BUCKET) * _IDX_BUCKET
            flat_p = np.zeros(pad, np.int32)
            flat_p[: flat.shape[0]] = flat
            off_cat = np.asarray(
                encoder_model.gather_offsets(a2, jnp.asarray(flat_p))
            )[: flat.shape[0]]
        # Emit bits block by block (stream order).
        c0 = 0
        for k, i in enumerate(block_of):
            c = counts[k]
            if c == 0:
                continue
            gs = (g0 + i) * B
            starts = all_starts[k]
            ln = all_lens[k].astype(np.int64)
            off = off_cat[c0 : c0 + c].astype(np.int64)
            nx = x[gs + starts + ln]
            bit_chunks.append(bitio.tokens_to_bits(off, ln, nx, params))
            c0 += c
        total_tokens += Ttot

    # Two-deep pipeline: device works on batch k+1 while host parses k.
    pending = None
    for bi in range(num_batches):
        if fault_injector is not None:
            def submit_checked(b=bi):
                fault_injector.check(b)
                return submit(b)
            nxt = faults_lib.with_retries(submit_checked, retries=retries)
        else:
            nxt = faults_lib.with_retries(submit, bi, retries=retries)
        if pending is not None:
            process(pending)
        pending = nxt
    if pending is not None:
        process(pending)

    st.tokens = total_tokens
    st.blocks = nb
    stream = bitio.concat_token_bits(bit_chunks, params)
    st.output_bytes = len(stream)
    return stream


def decode_bytes(data: bytes, backend: str = "host") -> bytes:
    """Decompress a complete reference-format stream.

    ``backend='host'`` (default) runs the vectorized numpy pointer-doubling
    decode — decode is zero-arithmetic gather work where 1-D dynamic gathers
    are a slow path on TPU; ``backend='device'`` uses the chunked device
    decoder (for device-resident pipelines).
    """
    if backend == "host":
        from . import host_decode

        return host_decode.decode(data)
    return decoder_model.decode_stream(data)
