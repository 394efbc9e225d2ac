"""BBDuk2 (VERDICT r1 #8): simultaneous fref/rref/lref/mref sets in one
pass (reference: jgi/BBDuk2.java)."""

import numpy as np
import pytest

from bbmap_tpu.tools import bbduk2


def _fa(path, entries):
    with open(path, "w") as fh:
        for name, seq in entries:
            fh.write(f">{name}\n{seq}\n")


def _fq(path, entries):
    with open(path, "w") as fh:
        for name, seq in entries:
            fh.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")


def _read_fq(path):
    out = {}
    with open(path) as fh:
        lines = [line.rstrip("\n") for line in fh]
    for i in range(0, len(lines), 4):
        out[lines[i][1:]] = lines[i + 1]
    return out


RNG = np.random.default_rng(5)
BODY = "".join("ACGT"[i] for i in RNG.integers(0, 4, size=60))
PHIX = "GAGTTTTATCGCTTCCATGACGCAG"       # filter set member
ADAPTER_R = "AGATCGGAAGAGCACACGTCTGAACT"  # right-trim adapter
PRIMER_L = "TTCAGACGTGTGCTCTTCCGATCTAA"   # left-trim primer
VECTOR_M = "CCGGTTAACCGGTTAACCGGTTAACC"   # mask set member


def test_bbduk2_four_sets(tmp_path):
    fref = tmp_path / "f.fa"
    rref = tmp_path / "r.fa"
    lref = tmp_path / "l.fa"
    mref = tmp_path / "m.fa"
    _fa(fref, [("phix", PHIX)])
    _fa(rref, [("adapter", ADAPTER_R)])
    _fa(lref, [("primer", PRIMER_L)])
    _fa(mref, [("vector", VECTOR_M)])

    reads = [
        ("clean", BODY),
        ("contaminated", BODY[:20] + PHIX + BODY[20:40]),
        ("adapter_tail", BODY[:40] + ADAPTER_R),
        ("primer_head", PRIMER_L + BODY[:40]),
        ("vector_mid", BODY[:20] + VECTOR_M + BODY[20:40]),
    ]
    fq = tmp_path / "in.fq"
    _fq(fq, reads)
    out = tmp_path / "out.fq"
    outm = tmp_path / "outm.fq"
    stats = tmp_path / "stats.txt"
    rc = bbduk2.main([f"in={fq}", f"out={out}", f"outm={outm}",
                      f"fref={fref}", f"rref={rref}", f"lref={lref}",
                      f"mref={mref}", "k=25", f"stats={stats}"])
    assert rc == 0
    kept = _read_fq(out)
    tossed = _read_fq(outm)
    # filter set discards the phiX-bearing read
    assert "contaminated" in tossed and "contaminated" not in kept
    # right-trim removes the adapter tail
    assert kept["adapter_tail"] == BODY[:40]
    # left-trim removes the primer head
    assert kept["primer_head"] == BODY[:40]
    # mask replaces the vector span with N
    assert "N" * len(VECTOR_M) in kept["vector_mid"]
    assert kept["vector_mid"].replace("N", "") == BODY[:20] + BODY[20:40]
    # clean read untouched
    assert kept["clean"] == BODY
    # stats has all four sections
    text = stats.read_text()
    for s in ("filter", "mask", "right", "left"):
        assert f"#Set {s}" in text


def test_bbduk2_rejects_ktrim_flag(tmp_path):
    fq = tmp_path / "in.fq"
    _fq(fq, [("r", BODY)])
    rc = bbduk2.main([f"in={fq}", "out=/dev/null", "ktrim=r",
                      "rliteral=" + ADAPTER_R])
    assert rc == 1  # reference: BBDuk2.java:334-338 throws


def test_bbduk2_literals_and_kmask_symbol(tmp_path):
    fq = tmp_path / "in.fq"
    _fq(fq, [("v", BODY[:10] + VECTOR_M + BODY[10:30])])
    out = tmp_path / "out.fq"
    rc = bbduk2.main([f"in={fq}", f"out={out}",
                      f"mliteral={VECTOR_M}", "k=25", "kmask=X"])
    assert rc == 0
    kept = _read_fq(out)
    assert "X" * len(VECTOR_M) in kept["v"]


def test_bbduk2_paired_either_bad(tmp_path):
    fq1 = tmp_path / "in1.fq"
    fq2 = tmp_path / "in2.fq"
    _fq(fq1, [("p", BODY)])
    _fq(fq2, [("p", BODY[:20] + PHIX + BODY[20:40])])
    out1 = tmp_path / "o1.fq"
    out2 = tmp_path / "o2.fq"
    rc = bbduk2.main([f"in={fq1}", f"in2={fq2}", f"out={out1}",
                      f"out2={out2}", f"fliteral={PHIX}", "k=25"])
    assert rc == 0
    # pair removed because mate 2 matched the filter set
    assert _read_fq(out1) == {}
