"""Merged sweep+walk kernel (ops/fused_walk.py), interpret mode.

The kernel must emit the exact serial token stream: payloads assembled
across batches (entry carried as a device scalar) are compared
byte-for-byte against the host-parse pipeline for every input class the
walk touches differently (text, runs/early-exit, random, ragged tails,
tiny inputs).

Each merged encode runs in a FRESH subprocess: XLA CPU deterministically
segfaults compiling this kernel's large interpret body late in a
long-lived test process (compiler-state accumulation -- every subset
passes standalone), so isolation is correctness here, not convenience.
Geometries stay small-depth; la=15 at the production window is
hardware-verified by the bench identity row every round.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from lz77_tpu import spec
from lz77_tpu.models import codec

from conftest import make_text

_RUNNER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
sys.path.insert(0, sys.argv[6])
from lz77_tpu import bitio, spec
from lz77_tpu.models import codec
from lz77_tpu.ops import fused_walk

la, sb, B, G = (int(a) for a in sys.argv[2:6])
data = open(sys.argv[1], "rb").read()
params = spec.Params(la=la, sb=sb)
x = np.frombuffer(data, np.uint8)
n = x.shape[0]
H, R = params.d_limit, params.len_limit
nblocks = -(-n // B)
parts = [bitio.header_bytes(params)]
entry = jnp.int32(0)
nb = params.width // 8
for bi in range(-(-nblocks // G) if n else 0):
    g0 = bi * G
    gn = min(G, nblocks - g0)
    gb, gh, gr, ga, gv = codec._batch_inputs(x, n, g0, gn, G, B, H, R)
    vt = min(G * B, n - g0 * B)
    payload, _, tot, entry = fused_walk.encode_batch_sweepwalk(
        jnp.asarray(gb), jnp.asarray(gh), jnp.asarray(gr),
        jnp.asarray(ga), jnp.asarray(gv), jnp.int32(vt), entry,
        la=la, sb=sb, interpret=True,
    )
    parts.append(np.asarray(payload)[: int(tot) * nb].tobytes())
open(sys.argv[7], "wb").write(b"".join(parts))
"""


def _geometry_ok(la, sb, B):
    from lz77_tpu.ops import fused_walk

    p = spec.Params(la=la, sb=sb)
    if fused_walk.geometry(la, sb, B, p.d_limit, p.len_limit) is None:
        pytest.skip("geometry unsupported at this size")


def _encode_merged(tmp_path, data, params, B, G):
    ip = tmp_path / "fw_in.bin"
    op = tmp_path / "fw_out.lz"
    ip.write_bytes(data)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-c", _RUNNER, str(ip), str(params.la),
         str(params.sb), str(B), str(G), repo, str(op)],
        capture_output=True, text=True, timeout=900,
        env=dict(os.environ, PYTHONPATH=repo),
    )
    assert r.returncode == 0, r.stderr[-1500:]
    return op.read_bytes()


@pytest.fixture(scope="module")
def mixed(rng):
    return (
        make_text(rng, 20_000)
        + b"\x00" * 5_000
        + np.asarray(rng.integers(0, 256, 3_000, dtype=np.uint8)).tobytes()
    )


@pytest.mark.parametrize(
    "la,sb",
    [(5, 31), (9, 15)]
    + ([(15, 4095)] if os.environ.get("LZ77_HEAVY_TESTS") else []),
)
def test_merged_stream_identity(tmp_path, mixed, la, sb):
    p = spec.Params(la=la, sb=sb)
    B, G = 8192, 2
    _geometry_ok(la, sb, B)
    s = _encode_merged(tmp_path, mixed, p, B, G)
    assert s == codec.encode_bytes(mixed, p, block_size=B, batch_blocks=G)
    assert codec.decode_bytes(s) == mixed


def test_merged_ragged_tiny_and_runs(tmp_path, mixed):
    """Ragged tails, tiny inputs and the runs/early-exit class."""
    p = spec.Params(la=5, sb=31)
    _geometry_ok(5, 31, 8192)
    for data in (mixed[:100], mixed[:1], b"", mixed[:9_000],
                 b"\x00" * 24_000):
        s = _encode_merged(tmp_path, data, p, 8192, 2)
        assert s == codec.encode_bytes(data, p, block_size=8192,
                                       batch_blocks=2), len(data)


def test_merged_entry_carry_across_batches(tmp_path, rng):
    """Multi-batch: the exit overhang must chain as the next batch's entry
    (runs make every block boundary land mid-token)."""
    p = spec.Params(la=9, sb=15)
    _geometry_ok(9, 15, 8192)
    data = b"ab" * 2_000 + b"\x00" * 12_000 + make_text(rng, 12_000)
    s = _encode_merged(tmp_path, data, p, 8192, 1)  # 1 block/batch
    assert s == codec.encode_bytes(data, p, block_size=8192, batch_blocks=1)


def test_geometry_gates():
    from lz77_tpu.ops import fused_walk

    # non-power-of-two-friendly and oversized shapes must decline
    assert fused_walk.geometry(15, 4095, 126963, 4095, 14) is not None
    assert fused_walk.geometry(15, 4095, 126963, 100, 14) is None  # H != dlim
    assert fused_walk.geometry(64, 65535, 1 << 20, 65535, 63) is None  # VMEM
