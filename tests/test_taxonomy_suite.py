"""Tests for the taxonomy suite (taxtree/gitable/gi2taxid/sortbytaxa/
splitbytaxa/gi2ancestors) and the id tools (idmatrix/idtree/msa/
cutprimers/commonkmers).

reference: tax/TaxTree.java, tax/GiToNcbi.java, tax/RenameGiToNcbi.java,
tax/SortByTaxa.java, tax/SplitByTaxa.java, tax/FindAncestor.java,
jgi/IdentityMatrix.java, tax/IDTree.java, jgi/FindPrimers.java,
jgi/CutPrimers.java, jgi/CommonKmers.java.
"""

import numpy as np
import pytest

from bbmap_tpu.io.fastx import read_seqs
from bbmap_tpu.tools.idtools import (commonkmers, cutprimers, idmatrix,
                                     idtree)
from bbmap_tpu.tools.idtools import msa as msa_tool
from bbmap_tpu.tools.taxonomy import (TaxTree, gi2ancestors, gi2taxid,
                                      gitable, sortbytaxa, splitbytaxa,
                                      taxtree_build)

NODES = """1\t|\t1\t|\tno rank\t|
2\t|\t131567\t|\tsuperkingdom\t|
131567\t|\t1\t|\tno rank\t|
1224\t|\t2\t|\tphylum\t|
1236\t|\t1224\t|\tclass\t|
562\t|\t1236\t|\tspecies\t|
1239\t|\t2\t|\tphylum\t|
1385\t|\t1239\t|\torder\t|
"""
NAMES = """1\t|\troot\t|\t\t|\tscientific name\t|
2\t|\tBacteria\t|\t\t|\tscientific name\t|
131567\t|\tcellular organisms\t|\t\t|\tscientific name\t|
1224\t|\tProteobacteria\t|\t\t|\tscientific name\t|
1236\t|\tGammaproteobacteria\t|\t\t|\tscientific name\t|
562\t|\tEscherichia coli\t|\t\t|\tscientific name\t|
1239\t|\tFirmicutes\t|\t\t|\tscientific name\t|
1385\t|\tBacillales\t|\t\t|\tscientific name\t|
"""


@pytest.fixture
def tax(tmp_path):
    (tmp_path / "nodes.dmp").write_text(NODES)
    (tmp_path / "names.dmp").write_text(NAMES)
    tree = tmp_path / "tree.taxtree.gz"
    assert taxtree_build([str(tmp_path / "names.dmp"),
                          str(tmp_path / "nodes.dmp"), str(tree)]) == 0
    (tmp_path / "gi.dmp").write_text("100\t562\n200\t1385\n300\t1224\n")
    table = tmp_path / "gitable.npz"
    assert gitable([str(tmp_path / "gi.dmp"), str(table)]) == 0
    return tmp_path, tree, table


def test_taxtree_roundtrip(tax):
    tmp, tree, _ = tax
    t = TaxTree.load_serialized(str(tree))
    assert t.name[562] == "Escherichia coli"
    assert t.lineage(562) == [562, 1236, 1224, 2, 131567, 1]
    assert t.lca([562, 1385]) == 2


def test_gi2taxid(tax, tmp_path):
    tmp, tree, table = tax
    fa = tmp_path / "in.fa"
    fa.write_text(">gi|100|ecoli\nACGT\n>gi|999|unknown\nGGGG\n")
    out = tmp_path / "out.fa"
    assert gi2taxid([f"in={fa}", f"out={out}", f"table={table}"]) == 0
    ids = [r.id for r in read_seqs(str(out))]
    assert ids[0] == "ncbi|562|ecoli"
    assert ids[1] == "gi|999|unknown"


def test_sortbytaxa_groups_related(tax, tmp_path):
    tmp, tree, table = tax
    fa = tmp_path / "in.fa"
    fa.write_text(">tid|1385|bac\nAAAA\n>tid|562|eco\nCCCC\n"
                  ">tid|1224|proteo\nGGGG\n")
    out = tmp_path / "s.fa"
    assert sortbytaxa([f"in={fa}", f"out={out}", f"tree={tree}"]) == 0
    ids = [r.id.split("|")[1] for r in read_seqs(str(out))]
    # proteobacteria lineage entries adjoin (562 under 1224)
    i224, i562, i1385 = (ids.index(x) for x in ("1224", "562", "1385"))
    assert abs(i224 - i562) == 1
    assert i1385 not in (min(i224, i562),)


def test_splitbytaxa(tax, tmp_path):
    tmp, tree, table = tax
    fa = tmp_path / "in.fa"
    fa.write_text(">tid|562|eco\nCCCC\n>tid|1385|bac\nAAAA\n")
    out = tmp_path / "grp_%.fa"
    assert splitbytaxa([f"in={fa}", f"out={out}", "level=phylum",
                        f"tree={tree}"]) == 0
    assert (tmp_path / "grp_Proteobacteria.fa").exists()
    assert (tmp_path / "grp_Firmicutes.fa").exists()


def test_gi2ancestors(tax, tmp_path, capsys):
    tmp, tree, table = tax
    f = tmp_path / "gis.txt"
    f.write_text("setA\t100,200\nsetB\t100,300\n")
    out = tmp_path / "anc.txt"
    assert gi2ancestors([f"in={f}", f"out={out}", f"table={table}",
                         f"tree={tree}"]) == 0
    rows = [l.split("\t") for l in out.read_text().splitlines()]
    assert rows[0][:2] == ["setA", "2"]
    assert rows[1][:2] == ["setB", "1224"]


def test_idmatrix_idtree(tmp_path):
    fa = tmp_path / "in.fa"
    fa.write_text(">a\nACGTACGTACGTACGTACGT\n"
                  ">b\nACGTACGTACGAACGTACGT\n"
                  ">c\nTTTTGGGGCCCCAAAATTTT\n")
    mat = tmp_path / "m.tsv"
    assert idmatrix([f"in={fa}", f"out={mat}"]) == 0
    rows = [l.split("\t") for l in mat.read_text().splitlines()]
    assert float(rows[0][1]) == 1.0
    assert float(rows[0][2]) == 0.95           # one sub in 20
    nwk = tmp_path / "t.nwk"
    assert idtree([f"in={mat}", f"out={nwk}"]) == 0
    tree = nwk.read_text().strip()
    assert tree.endswith(";")
    # a and b (most similar) join first
    assert "(a:" in tree and ",b:" in tree


def test_msa_cutprimers(tmp_path):
    fa = tmp_path / "in.fa"
    seq = "AACCGGTT" + "ACGTACGT" + "TTTTCCCC" + "GGATCCAT" + "AAGGTTCC"
    fa.write_text(f">s1\n{seq}\n")
    sam1 = tmp_path / "p1.sam"
    sam2 = tmp_path / "p2.sam"
    assert msa_tool([f"in={fa}", f"out={sam1}",
                     "literal=ACGTACGT"]) == 0
    assert msa_tool([f"in={fa}", f"out={sam2}",
                     "literal=GGATCCAT"]) == 0
    out = tmp_path / "cut.fa"
    assert cutprimers([f"in={fa}", f"out={out}", f"sam1={sam1}",
                       f"sam2={sam2}"]) == 0
    recs = list(read_seqs(str(out)))
    assert recs[0].bases == b"TTTTCCCC"
    out2 = tmp_path / "cut2.fa"
    assert cutprimers([f"in={fa}", f"out={out2}", f"sam1={sam1}",
                       f"sam2={sam2}", "include=t"]) == 0
    recs = list(read_seqs(str(out2)))
    assert recs[0].bases == b"ACGTACGT" + b"TTTTCCCC" + b"GGATCCAT"


def test_commonkmers(tmp_path, capsys):
    fa = tmp_path / "in.fa"
    fa.write_text(">s\nAAAAAAAACC\n")
    assert commonkmers([f"in={fa}", "k=2", "display=1",
                        "count=t"]) == 0
    out = capsys.readouterr().out
    # AA appears 7 times; canonical AA<->TT
    assert out.strip().split("\t")[1] == "AA=7"
