"""RQCFilter chained-pipeline tests: stage chain, artifact set,
nextera-LMP stage, library presets.

reference: jgi/RQCFilter.java:480 (process), :466 (reproduce file),
:497 (file-list), :805 (rqcStats); jgi/SplitNexteraLMP.java.
"""

import gzip
import os

import numpy as np
import pytest

from bbmap_tpu.tools import rqcfilter
from bbmap_tpu.tools.pairtools import NEXTERA_JUNCTION

ADAPTER = b"AGATCGGAAGAGCACACGTCTGAACTCCAGTCAC"


def _mk_inputs(tmp_path, n=30, with_adapter=True, junction=False):
    rng = np.random.default_rng(5)
    bases = np.frombuffer(b"ACGT", np.uint8)
    ref = tmp_path / "adapters.fa"
    ref.write_text(">adap\n" + ADAPTER.decode() + "\n")
    in1 = tmp_path / "r1.fq"
    in2 = tmp_path / "r2.fq"
    with open(in1, "wb") as f1, open(in2, "wb") as f2:
        for i in range(n):
            a = bytes(rng.choice(bases, 100))
            b = bytes(rng.choice(bases, 100))
            if junction:
                a = a[:40] + NEXTERA_JUNCTION + a[40:62]
            elif with_adapter and i % 3 == 0:
                a = a[:70] + ADAPTER[:30]
            f1.write(b"@r%d\n" % i + a + b"\n+\n" + b"I" * len(a)
                     + b"\n")
            f2.write(b"@r%d\n" % i + b + b"\n+\n" + b"I" * len(b)
                     + b"\n")
    return in1, in2, ref


def test_pipeline_artifacts(tmp_path):
    in1, in2, ref = _mk_inputs(tmp_path)
    outdir = tmp_path / "rqc"
    rc = rqcfilter.main([f"in={in1}", f"in2={in2}", "out=clean.fq.gz",
                         f"path={outdir}", f"ref={ref}",
                         "phix=t", "trimq=10"])
    assert rc == 0
    # the reference artifact set (RQCFilter.java:466-553, :805)
    for name in ("status.log", "file-list.txt", "reproduce.sh",
                 "filterStats.txt", "adapterStats.txt"):
        assert (outdir / name).exists(), name
    log = (outdir / "status.log").read_text()
    assert "ktrim start" in log and "ktrim finish" in log
    assert "filter start" in log and "filter finish" in log
    assert "#Remaining:" in log
    rep = (outdir / "reproduce.sh").read_text()
    assert rep.startswith("#!/bin/bash")
    assert rep.count("bbduk ") == 2         # trim + filter stages
    assert "ktrim=r" in rep and "k=23" in rep and "mink=11" in rep
    assert "tbo" in rep and "tpe" in rep
    fl = (outdir / "file-list.txt").read_text()
    assert "filtered_fastq=clean.fq.gz" in fl
    fs = (outdir / "filterStats.txt").read_text().splitlines()
    assert fs[0] == "#Stage\tReadsRemaining\tBasesRemaining"
    assert fs[1].startswith("trim\t60\t")   # nothing discarded
    assert fs[2].startswith("filter\t60\t")
    # output exists and adapter-bearing reads were trimmed
    with gzip.open(outdir / "clean.fq.gz", "rb") as fh:
        recs = fh.read().split(b"\n")
    seqs = [recs[i] for i in range(1, len(recs), 4) if recs[i]]
    assert len(seqs) == 60                  # interleaved pairs
    assert not any(ADAPTER[:25] in s for s in seqs)


def test_pipeline_nextera(tmp_path):
    in1, in2, ref = _mk_inputs(tmp_path, junction=True)
    outdir = tmp_path / "rqcn"
    rc = rqcfilter.main([f"in={in1}", f"in2={in2}", "out=clean.fq.gz",
                         f"path={outdir}", f"ref={ref}", "phix=f",
                         "nextera=t", "minlength=20"])
    assert rc == 0
    fl = (outdir / "file-list.txt").read_text()
    assert "lmp=clean.lmp.fq.gz" in fl
    assert "frag=clean.frag.fq.gz" in fl
    assert (outdir / "nexteraStats.txt").exists()
    stats = (outdir / "nexteraStats.txt").read_text()
    assert "Long Mate Pairs:" in stats
    with gzip.open(outdir / "clean.lmp.fq.gz", "rb") as fh:
        lmp = fh.read()
    assert lmp.count(b"@r") > 0             # junction reads split
    assert NEXTERA_JUNCTION not in lmp
    rep = (outdir / "reproduce.sh").read_text()
    assert "splitnexteralmp " in rep


def test_library_preset_clip(tmp_path):
    in1, in2, ref = _mk_inputs(tmp_path, with_adapter=False)
    outdir = tmp_path / "rqcc"
    rc = rqcfilter.main([f"in={in1}", "out=clean.fq.gz",
                         f"path={outdir}", "library=clip", "phix=f",
                         "filterflag=f"])
    assert rc == 0
    rep = (outdir / "reproduce.sh").read_text()
    # clip preset: literal linker, k=len(literal), exact (:907-924)
    assert "literal=GGTTCATCGTCAGG" in rep
    assert "k=14" in rep and "mm=f" in rep and "hdist=0" in rep


def test_maq_maxns_filters(tmp_path):
    """maq= discards low-avg-quality reads; maxns= discards N-rich
    reads (reference: BBDukF minAvgQuality/maxNs via RQCFilter maq=)."""
    from bbmap_tpu.tools import bbduk as bbduk_mod
    in1 = tmp_path / "r.fq"
    with open(in1, "wb") as fh:
        fh.write(b"@good\n" + b"ACGT" * 25 + b"\n+\n" + b"I" * 100
                 + b"\n")
        fh.write(b"@lowq\n" + b"ACGT" * 25 + b"\n+\n" + b"#" * 100
                 + b"\n")
        fh.write(b"@enns\n" + b"ACGTN" * 20 + b"\n+\n" + b"I" * 100
                 + b"\n")
    out = tmp_path / "out.fq"
    rc = bbduk_mod.main([f"in={in1}", f"out={out}", "maq=10",
                         "maxns=5"])
    assert rc == 0
    txt = out.read_text()
    assert "@good" in txt
    assert "@lowq" not in txt
    assert "@enns" not in txt


def test_ftm(tmp_path):
    from bbmap_tpu.tools import bbduk as bbduk_mod
    in1 = tmp_path / "r.fq"
    with open(in1, "wb") as fh:
        fh.write(b"@a\n" + b"ACGTA" * 20 + b"AC" + b"\n+\n"
                 + b"I" * 102 + b"\n")
    out = tmp_path / "out.fq"
    assert bbduk_mod.main([f"in={in1}", f"out={out}", "ftm=5"]) == 0
    seq = out.read_text().splitlines()[1]
    assert len(seq) == 100                  # 102 -> 100 (mod 5)
