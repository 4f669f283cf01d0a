"""Native host runtime tests: stream equality across backends + oracle."""

import numpy as np
import pytest

from lz77_tpu import native, spec
from lz77_tpu.models import spec_np

from conftest import CORPUS_SMALL

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


@pytest.mark.parametrize("name", CORPUS_SMALL)
def test_native_stream_identical_to_spec(name, rng):
    """Same exact-match semantics => byte-identical streams."""
    data = CORPUS_SMALL[name](rng)
    p = spec.Params(la=15, sb=255)
    assert native.encode(data, p) == spec_np.encode(data, p)


@pytest.mark.parametrize("name", CORPUS_SMALL)
def test_native_roundtrip(name, rng):
    data = CORPUS_SMALL[name](rng)
    for p in [spec.Params(), spec.Params(la=31, sb=1023)]:
        assert native.decode(native.encode(data, p)) == data


@pytest.mark.parametrize("name", ["text", "runs", "random"])
def test_native_vs_oracle(name, rng, oracle):
    data = CORPUS_SMALL[name](rng)
    stream = native.encode(data)
    assert oracle.decode(stream) == data
    assert len(stream) <= len(oracle.encode(data))
    assert native.decode(oracle.encode(data)) == data


def test_native_speed_sanity(rng):
    """Native encode must beat the reference's 3.78 MB/s baseline easily."""
    import time

    from conftest import make_text

    data = make_text(rng, 4 << 20)
    t0 = time.perf_counter()
    stream = native.encode(data)
    dt = time.perf_counter() - t0
    assert native.decode(stream) == data
    mbps = len(data) / dt / 1e6
    # Measured ~136 MB/s on the 2-vCPU CI host; 40 MB/s catches any >3x
    # regression while leaving headroom for a loaded machine.
    assert mbps > 40, f"native encode too slow: {mbps:.1f} MB/s"


def test_native_rejects_corrupt():
    with pytest.raises(ValueError):
        native.decode(b"\x01")


def test_native_rejects_oversize_header():
    """Crafted headers with la > 255 / sb > 65535-class widths must be
    rejected, not silently truncated: the fused 32-bit token read in
    lz77_decode assumes width <= 32 (untrusted-input surface)."""
    from lz77_tpu import bitio

    for sb_v, la_v in ((4095, 300), (4095, 60000), (4095, 0), (0, 15)):
        hdr = np.packbits(
            np.concatenate(
                [bitio.scalar_bits(sb_v, 16), bitio.scalar_bits(la_v, 16)]
            ),
            bitorder="little",
        ).tobytes()
        with pytest.raises(ValueError):
            native.decode(hdr + b"\x00" * 16)


# --- parallel (speculative-parse) encoder -------------------------------------


@pytest.mark.parametrize("name", CORPUS_SMALL)
def test_native_mt_identical_streams(name, rng):
    """The block-parallel encoder emits byte-identical streams to serial.

    Covers the splice path (small blocks force many boundaries) and several
    parameter sets (native/lz77host.cpp lz77_encode_mt).
    """
    data = CORPUS_SMALL[name](rng)
    for p in [spec.Params(), spec.Params(la=31, sb=1023)]:
        serial = native.encode(data, p, threads=1)
        for bs in (0, 1 << 16):
            assert native.encode(data, p, threads=2, block_size=bs) == serial


def test_native_mt_never_resync_inputs(rng):
    """Periodic inputs whose parses never resynchronise still match serial.

    Exercises the fixup op budget and the hash-rebuild fallback."""
    cases = [
        b"\x00" * (1 << 18),
        b"abcde" * (1 << 15),
        rng.integers(0, 256, 4000, dtype=np.uint8).tobytes() * 80,
    ]
    for data in cases:
        serial = native.encode(data, threads=1)
        assert native.encode(data, threads=2, block_size=1 << 16) == serial
        assert native.decode(serial) == data


def test_native_cli_binary(tmp_path, rng, oracle):
    """The standalone C++ CLI: roundtrip + stream identity + C interop."""
    import subprocess

    from conftest import make_text

    cli = native.build_cli()
    data = make_text(rng, 300_000)
    inp = tmp_path / "in.bin"
    inp.write_bytes(data)
    enc = tmp_path / "out.lz"
    dec = tmp_path / "round.bin"
    subprocess.run([cli, "-c", "-i", str(inp), "-o", str(enc)], check=True)
    subprocess.run([cli, "-d", "-i", str(enc), "-o", str(dec)], check=True)
    assert dec.read_bytes() == data
    # identical stream to the library encoder, and the C oracle decodes it
    assert enc.read_bytes() == native.encode(data)
    assert oracle.decode(enc.read_bytes()) == data
    # degenerate -s rejected without -f, accepted (safely) with it
    r = subprocess.run(
        [cli, "-c", "-i", str(inp), "-o", str(enc), "-s", "1024"],
        capture_output=True,
    )
    assert r.returncode != 0
    subprocess.run(
        [cli, "-c", "-i", str(inp), "-o", str(enc), "-s", "1024", "-f"],
        check=True,
    )
    subprocess.run([cli, "-d", "-i", str(enc), "-o", str(dec)], check=True)
    assert dec.read_bytes() == data
