"""End-to-end CLI tests on the bundled reference resources — the
BASELINE.json configs (bbmap paired phiX, bbduk truseq, bbmerge)."""

import os

import numpy as np
import pytest

from bbmap_tpu.io import fastx

PHIX = "/root/reference/resources/phix174_ill.ref.fa.gz"
S1 = "/root/reference/resources/sample1.fq.gz"
S2 = "/root/reference/resources/sample2.fq.gz"
TRUSEQ = "/root/reference/resources/truseq.fa.gz"


@pytest.mark.slow
def test_bbmap_paired_phix(tmp_path):
    from bbmap_tpu.tools import bbmap
    out = tmp_path / "mapped.sam"
    assert bbmap.main([f"ref={PHIX}", f"in={S1}", f"in2={S2}",
                       f"out={out}", "nodisk"]) == 0
    lines = out.read_text().splitlines()
    header = [l for l in lines if l.startswith("@")]
    recs = [l.split("\t") for l in lines if not l.startswith("@")]
    assert any(l.startswith("@SQ") and "LN:5386" in l for l in header)
    assert len(recs) == 200
    mapped = [r for r in recs if not int(r[1]) & 0x4]
    assert len(mapped) >= 180
    # flags consistent: every record paired-flagged, read1/2 partitioned
    assert all(int(r[1]) & 0x1 for r in recs)
    assert sum(1 for r in recs if int(r[1]) & 0x40) == 100
    assert sum(1 for r in recs if int(r[1]) & 0x80) == 100
    # mapped records carry sane positions and cigars
    for r in mapped:
        assert 1 <= int(r[3]) <= 5386
        assert r[5] != "*"
    # most mapped reads land within the truth window from the read name
    good = 0
    for r in mapped:
        truth = r[0].split("_")
        if len(truth) > 5 and truth[1].startswith("chr"):
            rel = int(truth[5])
            if abs(int(r[3]) - 1 - rel) <= 30:
                good += 1
    assert good >= 0.9 * len(mapped)


def test_bbduk_truseq(tmp_path):
    from bbmap_tpu.tools import bbduk
    out = tmp_path / "clean.fq"
    outm = tmp_path / "bad.fq"
    stats = tmp_path / "stats.txt"
    assert bbduk.main([f"in={S1}", f"out={out}", f"outm={outm}",
                       f"ref={TRUSEQ}", "k=23", "hdist=1", "ktrim=r",
                       "mink=11", f"stats={stats}"]) == 0
    n = sum(1 for _ in fastx.read_seqs(str(out)))
    assert n == 100
    assert stats.exists()


def test_bbmerge_samples(tmp_path):
    from bbmap_tpu.tools import bbmerge
    out = tmp_path / "merged.fq"
    outu = tmp_path / "unmerged.fq"
    ihist = tmp_path / "ihist.txt"
    assert bbmerge.main([f"in1={S1}", f"in2={S2}", f"out={out}",
                        f"outu={outu}", f"ihist={ihist}"]) == 0
    n_m = sum(1 for _ in fastx.read_seqs(str(out)))
    n_u = sum(1 for _ in fastx.read_seqs(str(outu)))
    assert n_m + n_u / 2 == 100
    assert ihist.exists()


@pytest.mark.slow
def test_pileup_after_mapping(tmp_path):
    from bbmap_tpu.tools import bbmap, pileup
    sam = tmp_path / "m.sam"
    assert bbmap.main([f"ref={PHIX}", f"in={S1}", f"out={sam}",
                       "nodisk"]) == 0
    cov = tmp_path / "covstats.txt"
    assert pileup.main([f"in={sam}", f"out={cov}"]) == 0
    rows = [l for l in cov.read_text().splitlines()
            if not l.startswith("#")]
    assert len(rows) == 1
    f = rows[0].split("\t")
    assert float(f[1]) > 0.5  # avg fold on phiX from 100 reads
