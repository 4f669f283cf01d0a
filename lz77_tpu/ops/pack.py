"""Device-side token bit-packing (the on-device half of the bit I/O layer).

The reference writes one bit per loop iteration (bitio.c:213-236).  Tokens
are fixed-width, so packing is an affine layout transform: for byte-aligned
widths (the default 24-bit token) each token is exactly width/8 bytes; for
general widths the (T, width) bit matrix regrouped into octets is a single
reshape + weighted sum.  Both are branch-free vectorized device ops, used
when the encode pipeline keeps tokens device-resident (sharded/fused paths);
the host equivalents live in ``lz77_tpu.bitio`` and the native library.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .. import spec


def pack_tokens_device(
    off: jnp.ndarray,
    ln: jnp.ndarray,
    nxt: jnp.ndarray,
    params: spec.Params,
) -> jnp.ndarray:
    """(T,) token fields -> packed payload bytes.

    Returns a uint8 array of ceil(T*width/8) bytes (zero bit padding at the
    tail for non-byte-aligned widths; the caller tracks the true bit count
    as T*width when concatenating blocks).
    """
    T = off.shape[0]
    W = params.width
    bo, bl = params.off_bits, params.len_bits
    v = (
        off.astype(jnp.int64)
        | (ln.astype(jnp.int64) << bo)
        | (nxt.astype(jnp.int64) << (bo + bl))
    )
    if W % 8 == 0:
        nb = W // 8
        shifts = jnp.arange(nb, dtype=jnp.int64) * 8
        return ((v[:, None] >> shifts[None, :]) & 0xFF).astype(
            jnp.uint8
        ).reshape(T * nb)
    # General width: bit matrix -> octets.
    bit_idx = jnp.arange(W, dtype=jnp.int64)
    bits = ((v[:, None] >> bit_idx[None, :]) & 1).astype(jnp.uint8)
    flat = bits.reshape(-1)
    pad = (-flat.shape[0]) % 8
    flat = jnp.concatenate([flat, jnp.zeros((pad,), jnp.uint8)])
    weights = (1 << jnp.arange(8, dtype=jnp.int32)).astype(jnp.int32)
    return (
        (flat.reshape(-1, 8).astype(jnp.int32) * weights[None, :]).sum(axis=1)
    ).astype(jnp.uint8)


def unpack_tokens_device(
    payload: jnp.ndarray, T: int, params: spec.Params
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Packed payload bytes -> (off, len, next) for T tokens (affine)."""
    W = params.width
    bo, bl = params.off_bits, params.len_bits
    if W % 8 == 0:
        nb = W // 8
        mat = payload[: T * nb].reshape(T, nb).astype(jnp.int64)
        shifts = jnp.arange(nb, dtype=jnp.int64) * 8
        v = (mat << shifts[None, :]).sum(axis=1)
    else:
        bits = jnp.unpackbits(
            payload, bitorder="little"
        )[: T * W].reshape(T, W)
        weights = (jnp.int64(1) << jnp.arange(W, dtype=jnp.int64))
        v = (bits.astype(jnp.int64) * weights[None, :]).sum(axis=1)
    off = v & ((1 << bo) - 1)
    ln = (v >> bo) & ((1 << bl) - 1)
    nxt = (v >> (bo + bl)) & 0xFF
    return off.astype(jnp.int32), ln.astype(jnp.int32), nxt.astype(jnp.int32)
