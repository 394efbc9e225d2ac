"""Tests for the jgi/driver long-tail tools (tools/smalltools.py).

reference behaviors: jgi/CountGC.java, jgi/MakeLengthHistogram.java,
jgi/FuseSequence.java, jgi/GetReads.java, jgi/SplitSamFile.java,
jgi/RenameReads.java, driver/MergeCoverageOTU.java,
driver/ReduceSilva.java, driver/FilterReadsWithSubs.java.
"""

import numpy as np

from bbmap_tpu.io.fastx import read_seqs
from bbmap_tpu.tools.smalltools import (
    countgc, filtersubs, fuse, getreads, mergeotus, muxbyname,
    phylip2fasta, readlength, reducesilva, rename, splitsam,
    summarizescafstats, textfile)
from bbmap_tpu.tools.smalltools import testformat as tf_tool


def _fa(path, seqs):
    with open(path, "w") as f:
        for name, s in seqs:
            f.write(f">{name}\n{s}\n")


def _fq(path, seqs):
    with open(path, "w") as f:
        for name, s in seqs:
            f.write(f"@{name}\n{s}\n+\n{'I' * len(s)}\n")


def test_countgc(tmp_path, capsys):
    fa = tmp_path / "a.fa"
    _fa(fa, [("s1", "GGCC"), ("s2", "AATT"), ("s3", "ACGTN")])
    out = tmp_path / "gc.txt"
    assert countgc([f"in={fa}", f"out={out}", "format=4"]) == 0
    rows = [l.split("\t") for l in out.read_text().splitlines()]
    assert rows[0] == ["s1", "4", "1.00000"]
    assert rows[1] == ["s2", "4", "0.00000"]
    assert rows[2][1] == "5" and rows[2][2] == "0.50000"


def test_readlength(tmp_path):
    fq = tmp_path / "r.fq"
    _fq(fq, [(f"r{i}", "A" * (50 + 10 * i)) for i in range(5)])
    out = tmp_path / "lh.txt"
    assert readlength([f"in={fq}", f"out={out}", "bin=10"]) == 0
    text = out.read_text()
    assert "#Reads:\t5" in text
    assert "#Max:\t90" in text
    assert "#Min:\t50" in text
    # one read per bin 50..90
    data = [l for l in text.splitlines() if not l.startswith("#")]
    counts = {int(l.split("\t")[0]): int(l.split("\t")[1])
              for l in data}
    for L in (50, 60, 70, 80, 90):
        assert counts[L] == 1


def test_fuse(tmp_path):
    fa = tmp_path / "a.fa"
    _fa(fa, [("s1", "ACGT"), ("s2", "TTTT")])
    out = tmp_path / "f.fa"
    assert fuse([f"in={fa}", f"out={out}", "pad=3", "name=joined"]) == 0
    recs = list(read_seqs(str(out)))
    assert len(recs) == 1
    assert recs[0].id == "joined"
    assert recs[0].bases == b"ACGTNNNTTTT"


def test_getreads_ranges(tmp_path):
    fq = tmp_path / "r.fq"
    _fq(fq, [(f"r{i}", "ACGT") for i in range(10)])
    out = tmp_path / "g.fq"
    assert getreads([f"in={fq}", "id=0,7-9,3", f"out={out}"]) == 0
    ids = [r.id for r in read_seqs(str(out))]
    assert ids == ["r0", "r3", "r7", "r8", "r9"]


def test_rename(tmp_path):
    fq = tmp_path / "r.fq"
    _fq(fq, [("orig1", "ACGT"), ("orig2", "GGGG")])
    out = tmp_path / "rn.fq"
    assert rename([f"in={fq}", f"out={out}", "prefix=sample"]) == 0
    ids = [r.id for r in read_seqs(str(out))]
    assert ids == ["sample_0", "sample_1"]


def test_splitsam(tmp_path):
    sam = tmp_path / "in.sam"
    sam.write_text(
        "@HD\tVN:1.3\n"
        "p1\t0\tc\t1\t37\t4M\t*\t0\t0\tACGT\tIIII\n"
        "m1\t16\tc\t5\t37\t4M\t*\t0\t0\tACGT\tIIII\n"
        "u1\t4\t*\t0\t0\t*\t*\t0\t0\tACGT\tIIII\n")
    p, m, u = (tmp_path / x for x in ("p.sam", "m.sam", "u.sam"))
    assert splitsam([str(sam), str(p), str(m), str(u), "header"]) == 0
    assert "p1" in p.read_text() and "@HD" in p.read_text()
    assert "m1" in m.read_text()
    assert "u1" in u.read_text()
    assert "m1" not in p.read_text()


def test_textfile(tmp_path, capsys):
    f = tmp_path / "t.txt"
    f.write_text("l0\nl1\nl2\nl3\n")
    assert textfile([str(f), "1", "2"]) == 0
    out = capsys.readouterr().out
    assert out == "l1\nl2\n"


def test_testformat(tmp_path, capsys):
    fq = tmp_path / "r.fq"
    _fq(fq, [("a", "ACGT")])
    assert tf_tool([str(fq)]) == 0
    out = capsys.readouterr().out
    assert out.startswith("fastq\traw\tsanger\t")


def test_mergeotus(tmp_path):
    inp = tmp_path / "cov.txt"
    inp.write_text(
        "#ID\tAvg_fold\tLength\tRef_GC\tCovered_percent\tPlus_reads\n"
        "a1 otuA\t10.0\t100\t0.5\t50.0\t7\n"
        "a2 otuA\t20.0\t300\t0.5\t100.0\t9\n"
        "b1 otuB\t5.0\t100\t0.4\t10.0\t3\n")
    out = tmp_path / "m.txt"
    assert mergeotus([f"in={inp}", f"out={out}"]) == 0
    lines = out.read_text().splitlines()
    assert lines[0].startswith("#ID")
    row = dict()
    for l in lines[1:]:
        f = l.split("\t")
        row[f[0]] = f
    # otuA: length 400, avg fold length-weighted (10*100+20*300)/400
    assert row["otuA"][2] == "400"
    assert abs(float(row["otuA"][1]) - 17.5) < 1e-6
    assert int(row["otuA"][5]) == 16
    assert row["otuB"][2] == "100"


def test_reducesilva(tmp_path):
    fa = tmp_path / "s.fa"
    _fa(fa, [("a;Bacteria;E.coli", "AAAA"),
             ("b;Bacteria;E.coli", "CCCC"),
             ("c;Bacteria;B.subtilis", "GGGG")])
    out = tmp_path / "r.fa"
    assert reducesilva([f"in={fa}", f"out={out}", "column=0"]) == 0
    recs = list(read_seqs(str(out)))
    assert [r.id.split(";")[-1] for r in recs] == ["E.coli",
                                                   "B.subtilis"]


def test_muxbyname(tmp_path):
    f1, f2 = tmp_path / "x.fa", tmp_path / "y.fa"
    _fa(f1, [("r1", "AAAA")])
    _fa(f2, [("r1", "CCCC")])
    out = tmp_path / "mux.fa"
    assert muxbyname([f"in={f1},{f2}", f"out={out}"]) == 0
    ids = [r.id for r in read_seqs(str(out))]
    assert ids == ["x_r1", "y_r1"]


def test_filtersubs(tmp_path):
    sam = tmp_path / "in.sam"
    # read with one sub at pos 2 (0-based), qual 'I'(40); perfect read;
    # indel read
    sam.write_text(
        "@HD\tVN:1.3\n"
        "sub\t0\tc\t1\t37\t4M\t*\t0\t0\tACGT\tII#I\tMD:Z:2A1\n"
        "perfect\t0\tc\t1\t37\t4M\t*\t0\t0\tACGT\tIIII\tMD:Z:4\n"
        "indel\t0\tc\t1\t37\t2M1I1M\t*\t0\t0\tACGT\tIIII\tMD:Z:3\n")
    out = tmp_path / "f.sam"
    # sub read's substituted base has qual '#'=2 -> outside [30,99]
    assert filtersubs([f"in={sam}", f"out={out}", "minq=30", "maxq=99",
                       "countindels=f"]) == 0
    kept = [l.split("\t")[0] for l in out.read_text().splitlines()
            if not l.startswith("@")]
    assert kept == []
    assert filtersubs([f"in={sam}", f"out={out}", "minq=0", "maxq=10",
                       "countindels=t", "keepperfect=t"]) == 0
    kept = [l.split("\t")[0] for l in out.read_text().splitlines()
            if not l.startswith("@")]
    assert set(kept) == {"sub", "perfect", "indel"}


def test_phylip2fasta(tmp_path):
    ph = tmp_path / "a.phy"
    ph.write_text(" 2 8\nseqA ACGT\nseqB TTTT\n\nACGT\nTTTT\n")
    out = tmp_path / "a.fa"
    assert phylip2fasta([f"in={ph}", f"out={out}"]) == 0
    recs = list(read_seqs(str(out)))
    assert [r.id for r in recs] == ["seqA", "seqB"]
    assert recs[0].bases == b"ACGTACGT"
    assert recs[1].bases == b"TTTTTTTT"


def test_summarizescafstats(tmp_path):
    s1 = tmp_path / "lib1.txt"
    s1.write_text("#name\t%unambiguousReads\n"
                  "orgA\t90.0\norgB\t8.0\norgC\t2.0\n")
    out = tmp_path / "sum.txt"
    assert summarizescafstats([f"in={s1}", f"out={out}"]) == 0
    lines = out.read_text().splitlines()
    f = lines[1].split("\t")
    assert f[1] == "orgA"
    assert abs(float(f[2]) - 90.0) < 1e-6
    assert abs(float(f[3]) - 10.0) < 1e-6


def test_bbest(tmp_path):
    from bbmap_tpu.tools.smalltools import bbest
    sam = tmp_path / "est.sam"
    sam.write_text(
        "@SQ\tSN:scaf1\tLN:1000\n@SQ\tSN:scaf2\tLN:500\n"
        # est1: two parts, both fully mapped to one scaffold
        "est1_part_1\t0\tscaf1\t1\t37\t50M\t*\t0\t0\t" + "A" * 50
        + "\t*\n"
        "est1_part_2\t0\tscaf1\t51\t37\t50M\t*\t0\t0\t" + "A" * 50
        + "\t*\n"
        # est2: unmapped
        "est2\t4\t*\t0\t0\t*\t*\t0\t0\t" + "C" * 40 + "\t*\n"
        # est3: parts on two scaffolds, half matched
        "est3_part_1\t0\tscaf1\t200\t37\t20M20S\t*\t0\t0\t" + "G" * 40
        + "\t*\n"
        "est3_part_2\t0\tscaf2\t1\t37\t40M\t*\t0\t0\t" + "G" * 40
        + "\t*\n")
    out = tmp_path / "stats.txt"
    assert bbest([f"in={sam}", f"out={out}"]) == 0
    text = out.read_text()
    assert "n_est=3" in text
    assert "n_ref_scaffolds=2" in text
    rows = {l.split("\t")[0].rstrip(":"): l.split("\t")
            for l in text.splitlines() if "\t" in l}
    assert rows["all"][1] == "1"       # est1
    assert rows["zero"][1] == "1"      # est2
    assert rows["multi"][1] == "1"     # est3


def test_dedupebymapping(tmp_path):
    from bbmap_tpu.tools.smalltools import dedupebymapping
    sam = tmp_path / "in.sam"
    sam.write_text(
        "@SQ\tSN:c\tLN:1000\n"
        # two duplicates at same coords; r2 has higher qual sum
        "r1\t0\tc\t100\t37\t4M\t*\t0\t0\tACGT\t!!!!\n"
        "r2\t0\tc\t100\t37\t4M\t*\t0\t0\tACGT\tIIII\n"
        # distinct position
        "r3\t0\tc\t200\t37\t4M\t*\t0\t0\tACGT\tIIII\n"
        # unmapped
        "r4\t4\t*\t0\t0\t*\t*\t0\t0\tACGT\tIIII\n")
    out = tmp_path / "out.sam"
    assert dedupebymapping([f"in={sam}", f"out={out}"]) == 0
    kept = [l.split("\t")[0] for l in out.read_text().splitlines()
            if not l.startswith("@")]
    assert kept == ["r2", "r3", "r4"]
    assert dedupebymapping([f"in={sam}", f"out={out}",
                            "keepunmapped=f"]) == 0
    kept = [l.split("\t")[0] for l in out.read_text().splitlines()
            if not l.startswith("@")]
    assert kept == ["r2", "r3"]


def test_callpeaks(tmp_path):
    from bbmap_tpu.tools.kmercountexact import callpeaks_main
    hist = tmp_path / "khist.txt"
    rows = []
    # bimodal: peak at 20 (error peak suppressed below minpeak) and 40
    for x in range(1, 80):
        y = 0
        y += int(1000 * np.exp(-((x - 20) ** 2) / 18.0))
        y += int(3000 * np.exp(-((x - 45) ** 2) / 40.0))
        rows.append(f"{x}\t{y}")
    hist.write_text("#Depth\tCount\n" + "\n".join(rows) + "\n")
    out = tmp_path / "peaks.txt"
    assert callpeaks_main([f"in={hist}", f"out={out}", "minpeak=5",
                           "maxpeakcount=4"]) == 0
    lines = [l for l in out.read_text().splitlines()
             if not l.startswith("#")]
    centers = [int(l.split("\t")[0]) for l in lines]
    assert any(abs(c - 20) <= 2 for c in centers)
    assert any(abs(c - 45) <= 2 for c in centers)
