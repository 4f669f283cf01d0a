"""Round-5 big-run driver: flat-RSS measurements that are actually the
process's own (VmHWM semantics), at multi-GB scale, on the no-Python
artifacts as well as the Python CLI.

Phases (each emits one JSON line):
  corpus   — write an N-GB mixed synthetic corpus file (Silesia-class tiles)
  native-encode — the standalone C++ CLI encodes file-to-file through the
             streamed O(window) encoder; its -r report pins flat RSS
             (VERDICT r4 next #4)
  native-decode — the standalone CLI decodes its own stream at O(window)
             RSS (VERDICT r4 next #2: the number that actually pins the
             claim, tens of MB, measured by the decode process itself)
  cli-decode — the Python CLI decode --report (native-streamed route):
             interpreter baseline + O(window), self-reported
  oracle   — the C reference binary decodes the same stream; chunk-compare

Usage: python experiments/bigrun_r5.py GB [workdir]
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lz77_tpu import conformance, corpus as corpus_lib, native  # noqa: E402


def chunk_equal(a: str, b: str) -> bool:
    sa, sb = os.path.getsize(a), os.path.getsize(b)
    if sa != sb:
        return False
    with open(a, "rb") as fa, open(b, "rb") as fb:
        while True:
            ca = fa.read(64 << 20)
            cb = fb.read(64 << 20)
            if ca != cb:
                return False
            if not ca:
                return True


def main():
    gb = float(sys.argv[1]) if len(sys.argv) > 1 else 4.0
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/bigrun_r5"
    os.makedirs(work, exist_ok=True)
    n = int(gb * (1 << 30))
    src = os.path.join(work, "big.bin")

    t0 = time.time()
    if not (os.path.exists(src) and os.path.getsize(src) == n):
        tiles = list(corpus_lib.get_corpus(scale=4).values())
        with open(src, "wb") as f:
            written = 0
            i = 0
            while written < n:
                t = tiles[i % len(tiles)]
                take = min(len(t), n - written)
                f.write(t[:take])
                written += take
                i += 1
    print(json.dumps({"phase": "corpus", "bytes": n,
                      "seconds": round(time.time() - t0, 1)}), flush=True)

    cli = native.build_cli()
    enc = os.path.join(work, "big.lz")

    def run_reported(args, tag):
        t0 = time.time()
        r = subprocess.run(args, capture_output=True, text=True)
        dt = time.time() - t0
        assert r.returncode == 0, (tag, r.stderr[-500:])
        rep = json.loads(r.stderr.strip().splitlines()[-1])
        rep["phase"] = tag
        rep["wall_seconds"] = round(dt, 1)
        print(json.dumps(rep), flush=True)
        return rep

    run_reported([cli, "-c", "-i", src, "-o", enc, "-r"], "native-encode")

    dec = os.path.join(work, "big.dec")
    run_reported([cli, "-d", "-i", enc, "-o", dec, "-r"], "native-decode")
    ok = chunk_equal(src, dec)
    print(json.dumps({"phase": "native-decode-verify", "ok": ok}), flush=True)
    assert ok
    os.unlink(dec)

    run_reported(
        [sys.executable, "-m", "lz77_tpu.cli", "-d", "-i", enc, "-o", dec,
         "--report"],
        "cli-decode",
    )
    ok = chunk_equal(src, dec)
    print(json.dumps({"phase": "cli-decode-verify", "ok": ok}), flush=True)
    assert ok
    os.unlink(dec)

    oracle = conformance.build_oracle(work)
    if oracle:
        t0 = time.time()
        subprocess.run([oracle, "-d", "-i", enc, "-o", dec], check=True)
        dt = time.time() - t0
        ok = chunk_equal(src, dec)
        print(json.dumps({"phase": "oracle-decode", "ok": ok,
                          "seconds": round(dt, 1),
                          "mb_s_of_input": round(n / dt / 1e6, 1)}),
              flush=True)
        assert ok
        os.unlink(dec)
    print(json.dumps({"phase": "done", "stream_bytes": os.path.getsize(enc)}),
          flush=True)


if __name__ == "__main__":
    main()
