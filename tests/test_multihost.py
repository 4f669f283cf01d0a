"""Real multi-process encode test: 2 CPU processes over Gloo (SURVEY.md §4e).

Spawns two fresh Python processes that jax.distributed.initialize against a
local coordinator, each encodes its block range, and process 0's assembled
stream must be byte-identical to the single-host encoder's.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)
import jax
jax.config.update("jax_platforms", "cpu")
pid, n, port, data_path, out_path = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4], sys.argv[5]
)
jax.distributed.initialize(f"localhost:{port}", num_processes=n,
                           process_id=pid)
sys.path.insert(0, os.path.dirname(out_path))
from lz77_tpu import spec
from lz77_tpu.parallel import distributed
data = open(data_path, "rb").read()
stream = distributed.encode_bytes_multihost(
    data, spec.Params(la=15, sb=255), block_size=1024, batch_blocks=2,
)
if pid == 0:
    open(out_path, "wb").write(stream)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.parametrize("nproc", [2])
def test_multihost_encode_identical_stream(nproc, tmp_path, rng):
    from conftest import make_text

    from lz77_tpu import spec
    from lz77_tpu.models import codec

    data = make_text(rng, 9000)
    data_path = tmp_path / "in.bin"
    data_path.write_bytes(data)
    out_path = tmp_path / "out.lz"
    worker_py = tmp_path / "worker.py"
    worker_py.write_text(WORKER)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    port = str(_free_port())
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker_py), str(i), str(nproc), port,
             str(data_path), str(out_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for i in range(nproc)
    ]
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.skip("multi-process run timed out in this environment")
        assert p.returncode == 0, err.decode()[-2000:]

    single = codec.encode_bytes(
        data, spec.Params(la=15, sb=255), block_size=1024, batch_blocks=2
    )
    assert out_path.read_bytes() == single
    assert codec.decode_bytes(single) == data
