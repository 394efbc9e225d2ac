"""Seal capability tests: vectorized attribution, paired input, ambig
modes, clearzone, reference artifact formats (stats/rpkm/refstats/tax).

reference: jgi/Seal.java:51 (assignTogether:2196, condenseLoose:2402,
filterTopScaffolds_withClearzone:2484, writeRPKM:885,
writeRefStats:930, writeTaxonomy:1036).
"""

import numpy as np
import pytest

from bbmap_tpu.core.batch import ReadBatch
from bbmap_tpu.tools import seal as seal_mod


def _mk_refs(rng, n=3, length=600):
    bases = np.frombuffer(b"ACGT", np.uint8)
    return [bytes(rng.choice(bases, length)) for _ in range(n)]


def _batch(rows, start_id=0):
    L = max(len(r) for r in rows)
    b = np.full((len(rows), L), ord("A"), np.uint8)
    for i, r in enumerate(rows):
        b[i, :len(r)] = np.frombuffer(r, np.uint8)
    return ReadBatch(
        bases=b, quality=None,
        lengths=np.array([len(r) for r in rows], np.int32),
        ids=[str(i) for i in range(len(rows))],
        numeric_ids=np.arange(start_id, start_id + len(rows),
                              dtype=np.int64))


def test_vectorized_attribution_matches_naive():
    rng = np.random.default_rng(3)
    refs = _mk_refs(rng, n=4)
    names = [f"ref{i}" for i in range(4)]
    s = seal_mod.Seal(refs, names, k=21, ambig="first")
    reads = [refs[i % 4][j * 7:j * 7 + 80]
             for i, j in zip(range(24), range(24))]
    asg = s.assign_batch(_batch(reads))
    for i, r in enumerate(reads):
        assert asg.primary[i] == i % 4, (i, asg.primary[i])
    assert s.reads_matched == 24
    assert int(s.read_counts.sum()) == 24
    assert int(s.frag_counts.sum()) == 24


def test_paired_kept_together():
    """A pair where mate1 weakly matches refB but mate2 strongly
    matches refA must be attributed (jointly) to refA — and counted as
    2 reads / 1 frag (reference: assignTogether readSum/fragCounts)."""
    rng = np.random.default_rng(7)
    refs = _mk_refs(rng, n=2)
    names = ["refA", "refB"]
    s = seal_mod.Seal(refs, names, k=21, ambig="first")
    m1 = refs[1][100:140]          # 20 kmers for refB
    m2 = refs[0][100:250]          # 130 kmers for refA
    asg = s.assign_batch(_batch([m1]), _batch([m2]))
    assert asg.primary[0] == 0
    assert s.read_counts[0] == 2 and s.read_counts[1] == 0
    assert s.frag_counts[0] == 1
    assert s.base_counts[0] == len(m1) + len(m2)


def test_ambig_modes():
    rng = np.random.default_rng(11)
    bases = np.frombuffer(b"ACGT", np.uint8)
    shared = bytes(rng.choice(bases, 300))
    refs = [shared, shared + bytes(rng.choice(bases, 50))]
    names = ["dupA", "dupB"]
    read = shared[50:200]

    s = seal_mod.Seal(refs, names, k=21, ambig="first")
    asg = s.assign_batch(_batch([read]))
    assert asg.primary[0] == 0                     # lowest id wins

    s = seal_mod.Seal(refs, names, k=21, ambig="toss")
    asg = s.assign_batch(_batch([read]))
    assert asg.primary[0] == -2                    # ambiguous tossed
    assert int(s.read_counts.sum()) == 0

    s = seal_mod.Seal(refs, names, k=21, ambig="all")
    asg = s.assign_batch(_batch([read]))
    assert s.read_counts[0] == 1 and s.read_counts[1] == 1
    assert set(asg.chosen_ids.tolist()) == {0, 1}

    # random: numericID % sites (reference: Seal.java:2212)
    s = seal_mod.Seal(refs, names, k=21, ambig="random")
    asg = s.assign_batch(_batch([read, read], start_id=4))
    assert asg.primary[0] == 0                     # 4 % 2 == 0
    assert asg.primary[1] == 1                     # 5 % 2 == 1


def test_clearzone():
    """clearzone keeps near-top scaffolds in the winner set."""
    rng = np.random.default_rng(13)
    bases = np.frombuffer(b"ACGT", np.uint8)
    a = bytes(rng.choice(bases, 400))
    b = bytes(rng.choice(bases, 400))
    # read: 120 bases of a + 100 bases of b -> counts 100 vs 80 @k=21
    read = a[:120] + b[:100]
    s0 = seal_mod.Seal([a, b], ["A", "B"], k=21, ambig="all",
                       clearzone=0)
    s0.assign_batch(_batch([read]))
    assert s0.read_counts[0] == 1 and s0.read_counts[1] == 0
    s1 = seal_mod.Seal([a, b], ["A", "B"], k=21, ambig="all",
                       clearzone=50)
    s1.assign_batch(_batch([read]))
    assert s1.read_counts[0] == 1 and s1.read_counts[1] == 1


def test_min_kmer_fraction():
    rng = np.random.default_rng(17)
    refs = _mk_refs(rng, n=1, length=400)
    other = _mk_refs(np.random.default_rng(99), n=1, length=400)
    read = refs[0][:40] + other[0][:110]   # 20 of 130 kmers hit
    s = seal_mod.Seal(refs, ["R"], k=21, min_kmer_fraction=0.5)
    asg = s.assign_batch(_batch([read]))
    assert asg.primary[0] == -1
    s = seal_mod.Seal(refs, ["R"], k=21, min_kmer_fraction=0.1)
    asg = s.assign_batch(_batch([read]))
    assert asg.primary[0] == 0


def test_artifact_formats(tmp_path):
    rng = np.random.default_rng(19)
    refs = _mk_refs(rng, n=2, length=500)
    names = ["scafA", "scafB"]
    s = seal_mod.Seal(refs, names, k=21, ambig="first")
    reads = [refs[0][i * 10:i * 10 + 90] for i in range(6)] \
        + [refs[1][i * 10:i * 10 + 90] for i in range(2)]
    s.assign_batch(_batch(reads))

    st = tmp_path / "stats.txt"
    s.write_stats(str(st), "in.fq", None, columns=3)
    lines = st.read_text().splitlines()
    assert lines[0] == "#File\tin.fq"
    assert lines[1] == "#Total\t8"
    assert lines[2].startswith("#Matched\t8\t100.0")
    assert lines[3] == "#Name\tReads\tReadsPct"
    assert lines[4].startswith("scafA\t6\t75.0")
    assert lines[5].startswith("scafB\t2\t25.0")

    rp = tmp_path / "rpkm.txt"
    s.write_rpkm(str(rp), "in.fq", None)
    lines = rp.read_text().splitlines()
    assert lines[4] == ("#Name\tLength\tBases\tCoverage\tReads\tRPKM"
                        "\tFrags\tFPKM")
    f = lines[5].split("\t")
    assert f[0] == "scafA" and f[1] == "500"
    assert f[4] == "6"
    # RPKM = reads * 1e9 / (mapped * len) = 6e9 / (8*500)
    assert abs(float(f[5]) - 6e9 / (8 * 500)) < 0.5
    # FPKM identical here (frags == reads, unpaired)
    assert abs(float(f[7]) - float(f[5])) < 0.5

    rf = tmp_path / "refstats.txt"
    s.write_refstats(str(rf), "in.fq", None, ["fileA", "fileB"],
                     [1, 1])
    lines = rf.read_text().splitlines()
    assert lines[4] == ("#Name\tLength\tScaffolds\tBases\tCoverage\t"
                        "Reads\tRPKM\tFrags\tFPKM")
    assert lines[5].split("\t")[0] == "fileA"
    assert lines[5].split("\t")[2] == "1"


def test_taxonomy_output(tmp_path):
    from bbmap_tpu.tools.taxonomy import TaxTree
    tree = TaxTree()
    # tiny tree: 1 <- 2 (domain) <- 10 (genus) <- 11 (species)
    tree.parent = {1: 1, 2: 1, 10: 2, 11: 10, 12: 10}
    tree.rank = {1: "no rank", 2: "domain", 10: "genus",
                 11: "species", 12: "species"}
    tree.name = {1: "root", 2: "Bacteria", 10: "Escherichia",
                 11: "E. coli", 12: "E. fergusonii"}

    rng = np.random.default_rng(23)
    refs = _mk_refs(rng, n=2, length=500)
    s = seal_mod.Seal(refs, ["tid|11|x", "tid|12|y"], k=21,
                      ambig="first")
    reads = [refs[0][i * 20:i * 20 + 90] for i in range(3)] \
        + [refs[1][:90]]
    s.assign_batch(_batch(reads))
    out = tmp_path / "tax.txt"
    s.write_taxonomy(str(out), "in.fq", None, tree,
                     min_level="species", max_level="domain")
    txt = out.read_text()
    lines = txt.splitlines()
    assert lines[4] == "#ID\tCount\tPercent\tLevel\tName"
    rows = {l.split("\t")[0]: l.split("\t") for l in lines[5:]}
    assert rows["10"][1] == "4"        # genus accumulates both species
    assert rows["11"][1] == "3"
    assert rows["12"][1] == "1"
    assert rows["2"][4] == "Bacteria"
    assert "1\t" not in txt[:0]        # root below min_level gate


def test_cli_paired_and_pattern(tmp_path):
    rng = np.random.default_rng(29)
    refs = _mk_refs(rng, n=2, length=500)
    ref = tmp_path / "refs.fa"
    ref.write_text(">rA\n" + refs[0].decode() + "\n>rB\n"
                   + refs[1].decode() + "\n")
    in1 = tmp_path / "r1.fq"
    in2 = tmp_path / "r2.fq"
    with open(in1, "wb") as f1, open(in2, "wb") as f2:
        for i in range(4):
            src = refs[0] if i < 3 else refs[1]
            f1.write(b"@p%d\n" % i + src[:80] + b"\n+\n" + b"I" * 80
                     + b"\n")
            f2.write(b"@p%d\n" % i + src[200:280] + b"\n+\n"
                     + b"I" * 80 + b"\n")
    stats = tmp_path / "st.txt"
    rpkm = tmp_path / "rp.txt"
    pat = str(tmp_path / "out_%.fq")
    rc = seal_mod.main([f"in={in1}", f"in2={in2}", f"ref={ref}",
                        f"stats={stats}", f"rpkm={rpkm}",
                        f"pattern={pat}", "k=21", "ambig=first"])
    assert rc == 0
    assert "rA\t6\t" in stats.read_text()       # 3 pairs -> 6 reads
    a_txt = (tmp_path / "out_rA.fq").read_text()
    assert a_txt.count("@p") == 6               # both mates routed
    b_txt = (tmp_path / "out_rB.fq").read_text()
    assert b_txt.count("@p") == 2


def test_dense_sparse_condense_parity(monkeypatch):
    """The O(hits) bincount condense and the sort-based sparse
    condense must agree on every ambig mode."""
    rng = np.random.default_rng(41)
    refs = _mk_refs(rng, n=5)
    names = [f"r{i}" for i in range(5)]
    reads = [refs[i % 5][j * 9:j * 9 + 85]
             for i, j in zip(range(40), range(40))]
    # a couple of multi-ref chimeras for clearzone/sites > 1 coverage
    reads += [refs[0][:60] + refs[1][:60], refs[2][:50] + refs[3][:70]]
    for amb in ("first", "all", "random", "toss"):
        dense = seal_mod.Seal(refs, names, k=21, ambig=amb,
                              clearzone=40)
        d = dense.assign_batch(_batch(reads))
        monkeypatch.setattr(seal_mod, "DENSE_CELLS_CAP", 0)
        sparse = seal_mod.Seal(refs, names, k=21, ambig=amb,
                               clearzone=40)
        sp = sparse.assign_batch(_batch(reads))
        monkeypatch.setattr(seal_mod, "DENSE_CELLS_CAP", 1 << 26)
        assert np.array_equal(d.primary, sp.primary), amb
        assert np.array_equal(
            np.sort(d.chosen_rows * 100 + d.chosen_ids),
            np.sort(sp.chosen_rows * 100 + sp.chosen_ids)), amb
        assert np.array_equal(dense.read_counts, sparse.read_counts)
        assert np.array_equal(dense.frag_counts, sparse.frag_counts)
