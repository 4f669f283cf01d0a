#!/usr/bin/env python
"""Benchmark harness: one JSON line for the driver.

Headline metric: encode throughput (MB/s) on text-like data with default
window parameters (la=15, sb=4095), matching BASELINE.md's measurement class
(reference: 3.78 MB/s on one Xeon core).  Extra context rides in the same
JSON object (decode MB/s, ratio, device, worst-case runs throughput).

Honest timing: compile + first-touch excluded via a warmup pass over a small
prefix; the measured pass runs the full corpus end-to-end including host
parse, bit packing and stream assembly; the stream is verified to decode
bit-exactly before any number is reported.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

BASELINE_ENCODE_TEXT = 3.78  # MB/s, BASELINE.md (reference, 1 CPU core)
BASELINE_DECODE_TEXT = 10.15
BASELINE_ENCODE_RUNS = 0.08


def make_text(n: int) -> bytes:
    rng = np.random.default_rng(0xC57D)
    words = [
        rng.integers(97, 123, size=rng.integers(2, 9), dtype=np.uint8)
        .tobytes()
        for _ in range(199)
    ]
    parts, total = [], 0
    while total < n:
        w = words[int(rng.integers(0, len(words)))]
        parts.append(w + b" ")
        total += len(w) + 1
    return b"".join(parts)[:n]


def main() -> int:
    size_mb = int(os.environ.get("BENCH_MB", "16"))
    use_tpu = os.environ.get("BENCH_BACKEND", "jax") == "jax"

    import jax

    from lz77_tpu import spec
    from lz77_tpu.models import codec

    params = spec.Params()
    data = make_text(size_mb << 20)
    block, batch = 1 << 16, 16

    kw = dict(block_size=block, batch_blocks=batch, matcher="brute")
    if not use_tpu:
        from lz77_tpu import native

        enc = lambda d: native.encode(d, params)  # noqa: E731
    else:
        enc = lambda d: codec.encode_bytes(d, params, **kw)  # noqa: E731

    # Warmup: compile all shapes on a small prefix.
    enc(data[: 2 * batch * block])

    t0 = time.perf_counter()
    stream = enc(data)
    dt_enc = time.perf_counter() - t0

    t0 = time.perf_counter()
    out = codec.decode_bytes(stream)
    dt_dec = time.perf_counter() - t0
    if out != data:
        print(json.dumps({"metric": "encode_text_mb_s", "value": 0.0,
                          "unit": "MB/s", "vs_baseline": 0.0,
                          "error": "roundtrip mismatch"}))
        return 1

    # Worst-case-for-the-reference input: runs (BST degenerates to 0.08 MB/s).
    runs = b"\x00" * (4 << 20)
    t0 = time.perf_counter()
    rs = enc(runs)
    dt_runs = time.perf_counter() - t0
    ok_runs = codec.decode_bytes(rs) == runs

    enc_mb_s = len(data) / dt_enc / 1e6
    dec_mb_s = len(data) / dt_dec / 1e6
    runs_mb_s = len(runs) / dt_runs / 1e6 if ok_runs else 0.0

    print(json.dumps({
        "metric": "encode_text_mb_s",
        "value": round(enc_mb_s, 3),
        "unit": "MB/s",
        "vs_baseline": round(enc_mb_s / BASELINE_ENCODE_TEXT, 2),
        "decode_mb_s": round(dec_mb_s, 3),
        "decode_vs_baseline": round(dec_mb_s / BASELINE_DECODE_TEXT, 2),
        "encode_runs_mb_s": round(runs_mb_s, 3),
        "runs_vs_baseline": round(runs_mb_s / BASELINE_ENCODE_RUNS, 2),
        "ratio": round(len(stream) / len(data), 4),
        "input_mb": size_mb,
        "device": str(jax.devices()[0]),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
