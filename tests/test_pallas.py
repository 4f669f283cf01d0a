"""Pallas match kernel tests (interpreter mode on the CPU mesh)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lz77_tpu import spec
from lz77_tpu.ops import match as match_ops
from lz77_tpu.ops import pallas_match

from conftest import make_text


def _args(x: np.ndarray, p: spec.Params, avail: int, valid_ext: int):
    B = x.shape[0]
    halo = np.zeros(p.d_limit, np.uint8)
    return (
        jnp.asarray(x), jnp.asarray(halo), jnp.zeros(p.len_limit, jnp.uint8),
        jnp.int32(avail), jnp.int32(valid_ext),
    )


@pytest.mark.parametrize("la,sb", [(15, 4095), (8, 500), (4, 129)])
def test_pallas_matches_brute(la, sb, rng):
    p = spec.Params(la=la, sb=sb)
    B = 2048
    x = np.frombuffer(make_text(rng, B), np.uint8)
    args = _args(x, p, 0, B)
    L1, O1 = pallas_match.find_matches_pallas(
        *args, la=la, sb=sb, tile=1024, interpret=True
    )
    L2, O2 = match_ops.find_matches_brute(*args, la=la, sb=sb)
    np.testing.assert_array_equal(np.asarray(L1), np.asarray(L2))
    np.testing.assert_array_equal(np.asarray(O1), np.asarray(O2))


def test_pallas_with_halo_and_shrinkage(rng):
    p = spec.Params()
    B = 1024
    data = np.frombuffer(make_text(rng, B + p.d_limit), np.uint8)
    halo, x = data[: p.d_limit], data[p.d_limit :]
    valid = B - 100  # partial final block: lookahead shrinkage at the end
    xb = x.copy()
    xb[valid:] = 0
    args = (
        jnp.asarray(xb), jnp.asarray(halo), jnp.zeros(p.len_limit, jnp.uint8),
        jnp.int32(p.d_limit), jnp.int32(valid),
    )
    L1, O1 = pallas_match.find_matches_pallas(
        *args, la=15, sb=4095, tile=1024, interpret=True
    )
    L2, O2 = match_ops.find_matches_brute(*args, la=15, sb=4095)
    np.testing.assert_array_equal(np.asarray(L1), np.asarray(L2))
    np.testing.assert_array_equal(np.asarray(O1), np.asarray(O2))


def test_pallas_rejects_bad_geometry():
    p = spec.Params()
    with pytest.raises(ValueError):
        pallas_match.find_matches_pallas(
            jnp.zeros(1000, jnp.uint8), jnp.zeros(p.d_limit, jnp.uint8),
            jnp.zeros(14, jnp.uint8), jnp.int32(0), jnp.int32(1000),
            la=15, sb=4095, tile=1024, interpret=True,
        )
    with pytest.raises(ValueError):
        pallas_match.find_matches_pallas(
            jnp.zeros(1024, jnp.uint8), jnp.zeros(10, jnp.uint8),
            jnp.zeros(14, jnp.uint8), jnp.int32(0), jnp.int32(1024),
            la=15, sb=4095, tile=1024, interpret=True,
        )
