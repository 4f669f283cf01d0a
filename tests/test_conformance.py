"""Corpus conformance in CI: every corpus class through the full contract.

The full-size runner is ``python -m lz77_tpu.conformance``; this test runs
the same matrix on truncated (256 KB) corpus files so the suite stays fast.
"""

import numpy as np
import pytest

from lz77_tpu import corpus as corpus_lib
from lz77_tpu import native, spec
from lz77_tpu.models import codec

CAP = 256 << 10


@pytest.fixture(scope="module")
def corpus():
    return {k: v[:CAP] for k, v in corpus_lib.get_corpus(scale=1).items()}


def test_corpus_has_expected_classes(corpus):
    names = {k.split(":")[1] for k in corpus}
    assert {"english", "source", "xml", "records", "dna", "binary",
            "zeros", "random"} <= names


@pytest.mark.parametrize("name", sorted(corpus_lib.SYNTH_CLASSES) +
                         ["stress:zeros", "stress:random"])
def test_conformance_matrix(corpus, oracle, name):
    key = name if ":" in name else f"synthetic:{name}"
    data = corpus[key]
    ours = native.encode(data, spec.Params())
    assert codec.decode_bytes(ours) == data          # roundtrip
    assert oracle.decode(ours) == data               # C decodes ours
    ref = oracle.encode(data)
    assert codec.decode_bytes(ref) == data           # we decode C's
    assert len(ours) <= len(ref)                     # size bar


def test_corpus_deterministic():
    a = corpus_lib.synth_english(4096)
    b = corpus_lib.synth_english(4096)
    assert a == b


def test_corpus_ratios_realistic(corpus):
    """Surrogate classes must actually compress like their real models:
    text-like well below 1.0, random above 1.0 (24-bit tokens)."""
    params = spec.Params()
    r = {k: len(native.encode(v, params)) / len(v) for k, v in corpus.items()}
    assert r["synthetic:english"] < 0.6
    assert r["synthetic:source"] < 0.6
    assert r["stress:zeros"] <= 0.21
    assert r["stress:random"] > 1.0


def test_big_streamed_small(tmp_path):
    """run_big_streamed end-to-end on a small input: manifest-path encode,
    oracle (or native) verification, bounded-RSS plumbing all wired."""
    from lz77_tpu import conformance

    r = conformance.run_big_streamed(
        0.002, str(tmp_path), matcher="sorted", block_size=65536,
        batch_blocks=4,
    )
    assert r["verified"]
    assert r["input_bytes"] == int(0.002 * (1 << 30))
    # round 4: the framework self-verifies with its streamed decoder and
    # cross-checks with the C oracle when present
    assert r["verifier"] in ("self-streamed+c-reference", "self-streamed")
    assert r["self_verified"]
    assert 0 < r["ratio"] < 1.2
