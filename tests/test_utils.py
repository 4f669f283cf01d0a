"""Aux subsystem tests: manifest resume, fault retry, metrics."""

import json

import numpy as np
import pytest

from lz77_tpu import spec
from lz77_tpu.models import codec
from lz77_tpu.utils import faults, manifest, metrics

from conftest import CORPUS_SMALL, make_text


def test_metrics_report_json():
    r = metrics.RunReport(mode="encode", input_bytes=1000, output_bytes=500,
                          seconds=0.5)
    d = json.loads(r.to_json())
    assert d["ratio"] == 0.5
    assert d["mb_per_s"] == 0.002
    assert metrics.scaling_efficiency(7.2, 1.0, 8) == pytest.approx(0.9)


def test_manifest_roundtrip(tmp_path):
    m = manifest.Manifest(la=15, sb=4095, block_size=1024, input_bytes=5000)
    m.append(10, 0, 3)
    m.append(20, 3, 0)
    path = str(tmp_path / "m.json")
    m.save(path)
    m2 = manifest.Manifest.load(path)
    assert m2.completed() == 2
    assert m2.next_entry() == 0
    assert m2.blocks[1].bit_offset == 32 + 10 * 24
    assert m2.next_bit_offset() == 32 + 30 * 24
    assert m2.compatible_with(spec.Params(), 1024, 5000)
    assert not m2.compatible_with(spec.Params(), 2048, 5000)


def test_fault_injection_and_retry():
    inj = faults.FaultInjector({1: 2})
    calls = []

    def fn(b):
        inj.check(b)
        calls.append(b)
        return b

    assert faults.with_retries(fn, 0, retries=2) == 0
    assert faults.with_retries(fn, 1, retries=2) == 1  # fails twice, then ok
    with pytest.raises(RuntimeError):
        faults.with_retries(lambda: inj.check(99) if not
                            inj.fail_batches.update({99: 5}) else None,
                            retries=1)


def test_encode_with_injected_faults_still_correct(rng):
    data = make_text(rng, 6000)
    p = spec.Params(la=15, sb=255)
    inj = faults.FaultInjector({0: 1, 2: 2})
    stream = codec.encode_bytes(
        data, p, block_size=1024, batch_blocks=2, fault_injector=inj,
        retries=3,
    )
    clean = codec.encode_bytes(data, p, block_size=1024, batch_blocks=2)
    assert stream == clean
    assert codec.decode_bytes(stream) == data


def test_encode_file_roundtrip(tmp_path, rng):
    data = make_text(rng, 5000)
    p = spec.Params(la=15, sb=255)
    src, dst = tmp_path / "in", tmp_path / "out"
    src.write_bytes(data)
    codec.encode_file(str(src), str(dst), p, block_size=1024)
    assert codec.decode_bytes(dst.read_bytes()) == data


def test_encode_file_with_manifest_matches_plain(tmp_path, rng):
    data = make_text(rng, 9000)
    p = spec.Params(la=15, sb=255)
    src, dst = tmp_path / "in", tmp_path / "out"
    src.write_bytes(data)
    mpath = str(tmp_path / "man.json")
    codec.encode_file(str(src), str(dst), p, block_size=1024,
                      batch_blocks=2, manifest_path=mpath)
    plain = codec.encode_bytes(data, p, block_size=1024, batch_blocks=2)
    assert dst.read_bytes() == plain
    # scratch + manifest cleaned up on success
    import os

    assert not os.path.exists(mpath)
    assert not os.path.exists(str(dst) + ".partial")


def test_encode_file_with_manifest_byte_aligned(tmp_path, rng):
    """Byte-aligned widths take the bounded-memory stream-copy assembly."""
    data = make_text(rng, 9000)
    p = spec.Params(la=15, sb=4095)  # 24-bit tokens
    src, dst = tmp_path / "in", tmp_path / "out"
    src.write_bytes(data)
    st = codec.EncodeStats()
    codec.encode_file(str(src), str(dst), p, block_size=1024,
                      batch_blocks=2, manifest_path=str(tmp_path / "m.json"),
                      stats=st)
    out = dst.read_bytes()
    assert out == codec.encode_bytes(data, p, block_size=1024, batch_blocks=2)
    assert st.output_bytes == len(out)


def test_encode_file_resume_after_crash(tmp_path, rng):
    """Crash mid-run (injected fault exhausts retries), resume, verify."""
    data = make_text(rng, 12000)
    p = spec.Params(la=15, sb=255)
    src, dst = tmp_path / "in", tmp_path / "out"
    src.write_bytes(data)
    mpath = str(tmp_path / "man.json")
    inj = faults.FaultInjector({3: 99})  # batch 3 fails hard
    with pytest.raises(RuntimeError):
        codec.encode_file(str(src), str(dst), p, block_size=1024,
                          batch_blocks=2, manifest_path=mpath,
                          fault_injector=inj, retries=1)
    import os

    assert os.path.exists(mpath)  # checkpoint survived the crash
    man = __import__("lz77_tpu.utils.manifest",
                     fromlist=["Manifest"]).Manifest.load(mpath)
    assert man.completed() >= 2
    codec.encode_file(str(src), str(dst), p, block_size=1024,
                      batch_blocks=2, manifest_path=mpath, resume=True)
    plain = codec.encode_bytes(data, p, block_size=1024, batch_blocks=2)
    assert dst.read_bytes() == plain
    assert codec.decode_bytes(dst.read_bytes()) == data


def test_profile_trace_captures(tmp_path, capsys):
    """--profile must produce a loadable device trace directory (SURVEY.md
    §5: the reference has no tracing at all)."""
    import os

    from lz77_tpu import cli

    inp = tmp_path / "in"
    out = tmp_path / "out"
    tracedir = tmp_path / "trace"
    inp.write_bytes(b"profile trace test " * 200)
    rc = cli.main(["-c", "-i", str(inp), "-o", str(out), "--matcher",
                   "chunked", "--block-size", "2048",
                   "--profile", str(tracedir)])
    capsys.readouterr()
    assert rc == 0
    captured = []
    for root, _, files in os.walk(tracedir):
        captured += [f for f in files if f.endswith((".pb", ".json.gz",
                                                     ".trace.json.gz"))]
    assert captured, "no trace events captured"
