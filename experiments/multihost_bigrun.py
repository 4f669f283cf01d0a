"""Multi-host encode at file scale (VERDICT r4 next #5).

Runs encode_file_multihost over N CPU processes (Gloo) on a >= 1 GB
input, records per-host wall/traffic and scaling efficiency vs the
measured single-process run of the same engine, and verifies the stream
with the streamed native decoder + the C oracle.

Usage: python experiments/multihost_bigrun.py GB NPROCS... [workdir]
e.g.   python experiments/multihost_bigrun.py 1 1 2 /tmp/mh
"""

import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORKER = r"""
import json, os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)
cfg0 = json.load(open(sys.argv[1]))
pid0 = int(sys.argv[2])
cores = sorted(os.sched_getaffinity(0))
if len(cores) >= 1:
    # pin each worker to one core + one XLA thread: honest strong scaling
    os.sched_setaffinity(0, {cores[pid0 % len(cores)]})
    os.environ["XLA_FLAGS"] = (
        "--xla_cpu_multi_thread_eigen=false intra_op_parallelism_threads=1"
    )
import jax
jax.config.update("jax_platforms", "cpu")
cfg = json.load(open(sys.argv[1]))
pid, n = int(sys.argv[2]), cfg["nproc"]
if n > 1:
    jax.distributed.initialize(cfg["coordinator"], num_processes=n,
                               process_id=pid)
from lz77_tpu import spec
from lz77_tpu.parallel import distributed

params = spec.Params(la=cfg.get("la", 15), sb=cfg.get("sb", 15))
t0 = time.perf_counter()
distributed.encode_file_multihost(
    cfg["data_path"], cfg["out_path"], params,
    block_size=cfg["block_size"], batch_blocks=cfg["batch_blocks"],
    matcher=cfg["matcher"],
)
wall = time.perf_counter() - t0
import resource
print(json.dumps({
    "pid": pid, "wall": round(wall, 2),
    "peak_rss_mb": round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1),
}))
"""


def free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_cluster(work, src, nproc, block_size, batch_blocks, matcher,
                timeout):
    cfg = {
        "nproc": nproc,
        "coordinator": f"localhost:{free_port()}",
        "data_path": src,
        "out_path": os.path.join(work, f"out_{nproc}.lz"),
        "block_size": block_size,
        "batch_blocks": batch_blocks,
        "matcher": matcher,
    }
    cfg_path = os.path.join(work, f"cfg_{nproc}.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    wp = os.path.join(work, "worker.py")
    with open(wp, "w") as f:
        f.write(WORKER)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    t0 = time.time()
    procs = [
        subprocess.Popen([sys.executable, wp, cfg_path, str(i)], env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for i in range(nproc)
    ]
    reports = []
    for p in procs:
        out, err = p.communicate(timeout=timeout)
        if p.returncode != 0:
            raise RuntimeError(err.decode()[-1500:])
        reports.append(json.loads(out.decode().strip().splitlines()[-1]))
    return cfg["out_path"], time.time() - t0, reports


def main():
    gb = float(sys.argv[1])
    nprocs = [int(a) for a in sys.argv[2:] if a.isdigit()]
    work = sys.argv[-1] if not sys.argv[-1].isdigit() else "/tmp/mh_bigrun"
    os.makedirs(work, exist_ok=True)

    from lz77_tpu import conformance, corpus as corpus_lib, native

    n = int(gb * (1 << 30))
    src = os.path.join(work, "big.bin")
    if not (os.path.exists(src) and os.path.getsize(src) == n):
        tiles = list(corpus_lib.get_corpus(scale=4).values())
        with open(src, "wb") as f:
            written, i = 0, 0
            while written < n:
                t = tiles[i % len(tiles)]
                take = min(len(t), n - written)
                f.write(t[:take])
                written += take
                i += 1
    print(json.dumps({"phase": "corpus", "bytes": n}), flush=True)

    block_size, batch_blocks, matcher = 1 << 18, int(os.environ.get("MH_BATCH_BLOCKS", "8")), "bitplane"
    ref_stream_path = None
    walls = {}
    for np_ in nprocs:
        out_path, wall, reports = run_cluster(
            work, src, np_, block_size, batch_blocks, matcher,
            timeout=7200,
        )
        walls[np_] = wall
        row = {
            "phase": f"multihost-{np_}proc", "wall_seconds": round(wall, 1),
            "mb_s": round(n / wall / 1e6, 2),
            "per_host": reports,
            "stream_bytes": os.path.getsize(out_path),
        }
        if 1 in walls and np_ > 1:
            row["scaling_efficiency_vs_1proc"] = round(
                walls[1] / (np_ * wall), 3
            )
        print(json.dumps(row), flush=True)
        if ref_stream_path is None:
            ref_stream_path = out_path
        else:
            same = (os.path.getsize(out_path)
                    == os.path.getsize(ref_stream_path))
            if same:
                with open(out_path, "rb") as fa, \
                        open(ref_stream_path, "rb") as fb:
                    while same:
                        ca, cb = fa.read(64 << 20), fb.read(64 << 20)
                        same = ca == cb
                        if not ca:
                            break
            print(json.dumps({"phase": f"identity-{np_}proc", "ok": same}),
                  flush=True)
            assert same, "multi-proc stream != 1-proc stream"

    # verify with the streamed native decoder + the C oracle
    dec = os.path.join(work, "big.dec")
    t0 = time.time()
    native.decode_file(ref_stream_path, dec)
    dec_s = time.time() - t0

    def chunk_equal(a, b):
        if os.path.getsize(a) != os.path.getsize(b):
            return False
        with open(a, "rb") as fa, open(b, "rb") as fb:
            while True:
                ca, cb = fa.read(64 << 20), fb.read(64 << 20)
                if ca != cb:
                    return False
                if not ca:
                    return True

    ok = chunk_equal(src, dec)
    print(json.dumps({"phase": "self-decode", "ok": ok,
                      "seconds": round(dec_s, 1)}), flush=True)
    assert ok
    os.unlink(dec)
    oracle = conformance.build_oracle(work)
    if oracle:
        subprocess.run([oracle, "-d", "-i", ref_stream_path, "-o", dec],
                       check=True)
        ok = chunk_equal(src, dec)
        print(json.dumps({"phase": "oracle-decode", "ok": ok}), flush=True)
        assert ok


if __name__ == "__main__":
    main()
