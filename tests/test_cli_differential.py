"""CLI differential harness: our CLI vs the reference binary.

Drives both CLIs over the same flag matrix (valid runs, every validation
error, ``-h`` semantics, duplicate flags) and compares exit codes, the
diagnostic messages we intentionally mirror (main.c:69-139), and stream
interchangeability (our encode -> reference decode and vice versa).
"""

from __future__ import annotations

import os
import subprocess

import pytest

from lz77_tpu import cli


def run_ours(argv, capsys):
    """Run our CLI in-process; returns (exit_code, stdout, stderr)."""
    rc = cli.main(argv)
    cap = capsys.readouterr()
    return rc, cap.out, cap.err


def run_ref(oracle, argv):
    """Run the reference binary; returns (exit_code, stdout, stderr)."""
    res = subprocess.run(
        [oracle.binary] + argv, capture_output=True, text=True
    )
    return res.returncode, res.stdout, res.stderr


# Each case: (argv-suffix builder, description).  {in}/{out} placeholders are
# replaced with real scratch paths so "file exists" never interferes.
ERROR_MATRIX = [
    (["-c", "-o", "{out}"], "Input file must be provided"),
    (["-c", "-i", "{in}"], "Output file must be provided"),
    (["-i", "{in}", "-o", "{out}"], "Select ENCODE or DECODE mode"),
    (["-c", "-i", "{in}", "-o", "{out}", "-l", "999"],
     "Bad lookahead size value."),
    (["-c", "-i", "{in}", "-o", "{out}", "-l", "1"],
     "Bad lookahead size value."),
    (["-c", "-i", "{in}", "-o", "{out}", "-s", "70000"],
     "Bad search-buffer size value."),
    (["-c", "-i", "{in}", "-i", "{in}", "-o", "{out}"],
     "Multiple input files not allowed."),
    (["-c", "-i", "{in}", "-o", "{out}", "-o", "{out}"],
     "Multiple output files not allowed."),
]


@pytest.fixture()
def scratch(tmp_path):
    inp = tmp_path / "in.bin"
    inp.write_bytes(b"differential cli test input, abcabcabcabc" * 40)
    return {"in": str(inp), "out": str(tmp_path / "out.bin"),
            "out2": str(tmp_path / "out2.bin")}


def fill(argv, scratch):
    return [a.replace("{in}", scratch["in"]).replace("{out}", scratch["out"])
            for a in argv]


@pytest.mark.parametrize("argv,message", ERROR_MATRIX,
                         ids=[m for _, m in ERROR_MATRIX])
def test_validation_errors_match(oracle, scratch, capsys, argv, message):
    argv = fill(argv, scratch)
    rc_ref, _, err_ref = run_ref(oracle, argv)
    rc_ours, _, err_ours = run_ours(argv, capsys)
    assert rc_ref != 0 and rc_ours != 0
    assert rc_ours == rc_ref, f"exit codes differ for {argv}"
    assert message in err_ref, "reference message drifted from main.c"
    assert message in err_ours


def test_help_alone_prints_usage_then_fails(oracle, capsys):
    """-h prints usage and KEEPS PARSING (main.c:117-126): with no input
    file it then fails validation, in both CLIs, with identical stdout."""
    rc_ref, out_ref, err_ref = run_ref(oracle, ["-h"])
    rc_ours, out_ours, err_ours = run_ours(["-h"], capsys)
    assert rc_ref == rc_ours != 0
    assert out_ours == out_ref  # verbatim usage text
    assert "Input file must be provided" in err_ref
    assert "Input file must be provided" in err_ours


def test_help_with_full_command_still_encodes(oracle, scratch, capsys):
    """-h inside a valid command prints usage AND performs the encode."""
    argv = ["-h", "-c", "-i", scratch["in"], "-o", scratch["out"]]
    rc_ref, out_ref, _ = run_ref(oracle, argv)
    assert rc_ref == 0 and os.path.getsize(scratch["out"]) > 4
    ref_stream = open(scratch["out"], "rb").read()
    os.unlink(scratch["out"])

    rc_ours, out_ours, _ = run_ours(argv + ["--backend", "native"], capsys)
    assert rc_ours == 0
    assert out_ours == out_ref
    our_stream = open(scratch["out"], "rb").read()
    assert len(our_stream) <= len(ref_stream)


def test_missing_input_file_exit_codes(oracle, scratch, capsys):
    argv = ["-c", "-i", scratch["in"] + ".nope", "-o", scratch["out"]]
    rc_ref, _, err_ref = run_ref(oracle, argv)
    rc_ours, _, err_ours = run_ours(argv, capsys)
    assert rc_ref != 0 and rc_ours != 0
    assert rc_ours == rc_ref
    assert err_ref and err_ours  # both diagnose, wording differs (perror)


def test_mode_last_one_wins(oracle, scratch, capsys):
    """-d then -c = encode in the reference (mode variable overwritten);
    same in ours (store_const, last wins)."""
    argv = ["-d", "-c", "-i", scratch["in"], "-o", scratch["out"]]
    rc_ref, _, _ = run_ref(oracle, argv)
    assert rc_ref == 0
    ref_stream = open(scratch["out"], "rb").read()
    os.unlink(scratch["out"])
    rc_ours, _, _ = run_ours(argv + ["--backend", "native"], capsys)
    assert rc_ours == 0
    our_stream = open(scratch["out"], "rb").read()
    assert our_stream[:4] == ref_stream[:4]  # same header => encode mode


@pytest.mark.parametrize("flags", [[], ["-l", "32"], ["-s", "1023"],
                                   ["-l", "8", "-s", "255"]])
def test_cross_decode_over_flag_matrix(oracle, scratch, capsys, flags):
    """Our encode -> reference decode and vice versa, per flag set."""
    data = open(scratch["in"], "rb").read()
    # ours encode (native backend: fast, byte-identical to jax backends)
    rc, _, _ = run_ours(
        ["-c", "-i", scratch["in"], "-o", scratch["out"],
         "--backend", "native"] + flags, capsys)
    assert rc == 0
    ours = open(scratch["out"], "rb").read()
    assert oracle.decode(ours) == data
    # reference encode -> our decode
    ref = oracle.encode(
        data,
        la=flags[flags.index("-l") + 1] if "-l" in flags else None,
        sb=flags[flags.index("-s") + 1] if "-s" in flags else None,
    )
    assert len(ours) <= len(ref)
    with open(scratch["out2"], "wb") as f:
        f.write(ref)
    rc, _, _ = run_ours(
        ["-d", "-i", scratch["out2"], "-o", scratch["out"],
         "--backend", "native"], capsys)
    assert rc == 0
    assert open(scratch["out"], "rb").read() == data
