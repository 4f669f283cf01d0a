"""File decoder pipeline.

Token streams have no block markers (the format is self-describing only via
its 32-bit header), so decode is chunked over *tokens*: each chunk resolves
fully in parallel on device (``ops.decode``), and chunks advance serially
carrying only the last H decoded bytes — the only true dependency, identical
in role to the reference decoder's recycled window (lz77.c:172-175).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import bitio, spec
from ..ops import decode as decode_ops

DEFAULT_CHUNK_TOKENS = 1 << 15


@functools.partial(jax.jit, static_argnames=("la",))
def _decode_chunk(off, ln, nxt, count, prev_tail, *, la):
    """One token chunk -> (bytes, length, next tail) — tail stays on device.

    The H-byte tail (the reference decoder's recycled window,
    lz77.c:172-175) is computed ON DEVICE so consecutive chunk dispatches
    chain without a host round-trip in the dependency path; the host only
    fetches each chunk's output bytes.
    """
    out, out_len = decode_ops.decode_tokens(
        off, ln, nxt, count, prev_tail, la=la
    )
    H = prev_tail.shape[0]
    ext = jnp.concatenate([prev_tail, out])
    new_tail = jax.lax.dynamic_slice(ext, (out_len,), (H,)) if H else prev_tail
    return out, out_len, new_tail


def decode_stream(
    data: bytes, chunk_tokens: int = DEFAULT_CHUNK_TOKENS
) -> bytes:
    """Decompress a complete stream (ours or the C encoder's)."""
    params, off, ln, nxt = bitio.parse_stream(data)
    T = off.shape[0]
    if T == 0:
        return b""
    # Tail must cover the largest representable offset, not just sb: foreign
    # headers may advertise any 16-bit sb and we mirror the C decoder's
    # tolerance of whatever the field can hold.
    H = (1 << params.off_bits) - 1
    CT = min(chunk_tokens, 1 << max(0, (T - 1).bit_length()))

    off = off.astype(np.int32)
    ln = ln.astype(np.int32)
    nxt = nxt.astype(np.int32)

    handles: list[tuple] = []
    tail = jnp.zeros((max(H, 1),), jnp.uint8)[:H] if H else jnp.zeros(
        (0,), jnp.uint8
    )
    for c0 in range(0, T, CT):
        n = min(CT, T - c0)
        o = np.zeros(CT, np.int32)
        l = np.zeros(CT, np.int32)
        x = np.zeros(CT, np.int32)
        o[:n] = off[c0 : c0 + n]
        l[:n] = ln[c0 : c0 + n]
        x[:n] = nxt[c0 : c0 + n]
        out, out_len, tail = _decode_chunk(
            jnp.asarray(o), jnp.asarray(l), jnp.asarray(x),
            jnp.int32(n), tail, la=params.la,
        )
        handles.append((out, out_len))
    pieces = [np.asarray(out)[: int(out_len)] for out, out_len in handles]
    return b"".join(p.tobytes() for p in pieces)
