"""Tool-level tests: reformat, stats, kmercountexact, bbnorm, kcount."""

import gzip
import os

import numpy as np
import pytest

from bbmap_tpu.index.kcount import KCountArray
from bbmap_tpu.tools import bbnorm, kmercountexact, reformat, stats

PHIX = "/root/reference/resources/phix174_ill.ref.fa.gz"
S1 = "/root/reference/resources/sample1.fq.gz"


def test_reformat_fq_to_fa(tmp_path):
    out = tmp_path / "x.fa"
    assert reformat.main([f"in={S1}", f"out={out}"]) == 0
    lines = out.read_text().splitlines()
    assert lines[0].startswith(">")
    assert len(lines) == 200


def test_reformat_sample(tmp_path):
    out = tmp_path / "s.fq"
    assert reformat.main([f"in={S1}", f"out={out}", "samplerate=0.5",
                          "sampleseed=7"]) == 0
    n = sum(1 for l in out.read_text().splitlines()
            if l.startswith("@"))
    assert 20 < n < 80


def test_stats_phix(capsys):
    assert stats.main([f"in={PHIX}"]) == 0
    out = capsys.readouterr().out
    assert "5386" in out
    assert "scaffold total:         \t1" in out


def test_kmer_counter():
    c = kmercountexact.KmerCounter(5, chunk_kmers=100)
    seq = np.frombuffer(b"ACGTACGTACGTACGTAAAAACCCCC", np.uint8)
    c.add_batch(seq[None, :])
    c.add_batch(seq[None, :])
    keys, counts = c.finish()
    assert (counts % 2 == 0).all()  # everything added twice
    total = counts.sum()
    assert total == 2 * (len(seq) - 4)


def test_kcount_array():
    kca = KCountArray(1 << 16, cell_bits=16, hashes=2)
    rng = np.random.default_rng(0)
    kmers = rng.integers(0, 2**50, 1000)
    kca.increment(kmers)
    kca.increment(kmers[:500])
    v = kca.read(kmers)
    assert (v >= 1).all()
    assert (v[:500] >= 2).mean() > 0.99
    # count-min: values can only over-estimate
    assert (v[500:] >= 1).all()


def test_bbnorm_roundtrip(tmp_path):
    # duplicate a read 50x + singletons; normalization keeps fewer dupes
    rng = np.random.default_rng(1)
    bases = np.frombuffer(b"ACGT", np.uint8)
    dup = bytes(rng.choice(bases, 100))
    inp = tmp_path / "in.fq"
    with open(inp, "wb") as fh:
        for i in range(50):
            fh.write(b"@dup%d\n" % i + dup + b"\n+\n" + b"I" * 100 + b"\n")
    out = tmp_path / "out.fq"
    assert bbnorm.main([f"in={inp}", f"out={out}", "target=10", "k=31",
                        "mindepth=1", "cells=65536"]) == 0
    n = sum(1 for l in open(out) if l.startswith("@dup"))
    assert n < 25  # ~10/50 kept
