"""Barcode suite (VERDICT r1 #10; reference: jgi/CountBarcodes.java,
MergeBarcodes.java, CorrelateBarcodes.java, RemoveBadBarcodes.java)."""

from bbmap_tpu.tools import barcodes


def _fq(path, entries):
    with open(path, "w") as fh:
        for name, seq, qual in entries:
            fh.write(f"@{name}\n{seq}\n+\n{qual}\n")


def test_countbarcodes(tmp_path):
    fq = tmp_path / "in.fq"
    _fq(fq, [(f"read{i}:{code}", "ACGT", "IIII") for i, code in
             enumerate(["ACGTAC", "ACGTAC", "ACGTAA", "NNGTAC"])])
    out = tmp_path / "counts.txt"
    assert barcodes.countbarcodes(
        [f"in={fq}", f"out={out}", "expected=ACGTAC"]) == 0
    lines = out.read_text().splitlines()
    assert lines[0].startswith("#code")
    rows = [l.split("\t") for l in lines[1:]]
    assert rows[0][:2] == ["ACGTAC", "2"] and rows[0][4] == "valid"
    by_code = {r[0]: r for r in rows}
    assert by_code["ACGTAA"][2] == "1"     # hamming dist to expected
    assert by_code["NNGTAC"][2] == "2"


def test_removebadbarcodes(tmp_path):
    fq = tmp_path / "in.fq"
    _fq(fq, [("a:ACGT", "AAAA", "IIII"), ("b:AC+T", "AAAA", "IIII"),
             ("c:ANGT", "AAAA", "IIII"), ("d", "AAAA", "IIII")])
    out = tmp_path / "out.fq"
    assert barcodes.removebadbarcodes([f"in={fq}", f"out={out}"]) == 0
    kept = [l[1:].strip() for l in out.read_text().splitlines()
            if l.startswith("@")]
    assert kept == ["a:ACGT", "b:AC+T"]


def test_merge_then_filter_barcodes(tmp_path):
    bar = tmp_path / "bar.fq"
    reads = tmp_path / "reads.fq"
    _fq(bar, [("r0", "ACGTAC", "IIIIII"), ("r1", "TTTTTT", "######")])
    _fq(reads, [("r0", "AAAACCCC", "IIIIIIII"),
                ("r1", "GGGGTTTT", "IIIIIIII")])
    merged = tmp_path / "merged.fq"
    assert barcodes.mergebarcodes(
        [f"in={reads}", f"bar={bar}", f"out={merged}"]) == 0
    ids = [l[1:].strip() for l in merged.read_text().splitlines()
           if l.startswith("@")]
    # reference: MergeBarcodes.java:361-366 'BAR_QUAL_' id prefix
    assert ids[0] == "ACGTAC_IIIIII_r0"
    assert ids[1] == "TTTTTT_######_r1"
    # filterbarcodes (CorrelateBarcodes) drops the low-quality barcode
    filt = tmp_path / "filt.fq"
    cor = tmp_path / "cor.txt"
    assert barcodes.filterbarcodes(
        [f"in={merged}", f"out={filt}", "maq=20",
         f"outcor={cor}"]) == 0
    kept = [l[1:].strip() for l in filt.read_text().splitlines()
            if l.startswith("@")]
    assert kept == ["ACGTAC_IIIIII_r0"]
    assert cor.read_text().startswith("#Read1_Q")
