import pytest
"""liftover (reference: fileIO/ChainBlock.java, driver/Translator.java)
and decontaminate (reference: jgi/DecontaminateByNormalization.java) +
the ehist/bqhist/timehist battery additions (VERDICT r1 #10/#26)."""

import numpy as np

CHAIN = """chain 1000 chrA 300 + 0 100 chrB 200 + 10 110 1
60\t10\t5
30

chain 900 chrA 300 + 200 260 chrC 120 - 20 80 2
60

"""


def test_liftover_plus_minus_and_gaps(tmp_path):
    from bbmap_tpu.tools import liftover
    chain = tmp_path / "a.chain"
    chain.write_text(CHAIN)
    bed = tmp_path / "in.bed"
    bed.write_text("chrA\t5\t15\tx\nchrA\t75\t85\tseg2\n"
                   "chrA\t150\t160\tgap\nchrA\t210\t220\tminus\n")
    out = tmp_path / "out.bed"
    un = tmp_path / "un.bed"
    assert liftover.main([f"chain={chain}", f"in={bed}",
                          f"out={out}", f"unmapped={un}"]) == 0
    rows = {l.split("\t")[3]: l.split("\t")
            for l in out.read_text().splitlines()}
    assert rows["x"][:3] == ["chrB", "15", "25"]
    # second aligned chunk: t70.. maps with dt=10/dq=5 applied
    assert rows["seg2"][:3] == ["chrB", "80", "90"]
    # minus-strand chain emits PLUS coordinates
    assert rows["minus"][:3] == ["chrC", "50", "60"]
    assert "gap" in un.read_text()


def test_liftover_positions(tmp_path):
    from bbmap_tpu.tools import liftover
    chain = tmp_path / "a.chain"
    chain.write_text(CHAIN)
    pos = tmp_path / "pos.txt"
    pos.write_text("chrA\t0\nchrA\t205\n")
    out = tmp_path / "out.txt"
    assert liftover.main([f"chain={chain}", f"in={pos}",
                          f"out={out}"]) == 0
    lines = out.read_text().splitlines()
    assert lines[0] == "chrB\t10\t+"
    assert lines[1].startswith("chrC\t45\t-")


@pytest.mark.slow
def test_decontaminate_pipeline(tmp_path):
    """Plumbing: merged->normalized->demuxed->mapped->filtered; the
    uncovered junk contig lands in dirty."""
    from bbmap_tpu.tools import covtools
    rng = np.random.default_rng(0)
    A = "".join("ACGT"[i] for i in rng.integers(0, 4, 6000))
    junk = "".join("ACGT"[i] for i in rng.integers(0, 4, 1500))
    ref = tmp_path / "lib1.fa"
    ref.write_text(f">contigA\n{A}\n>contigJunk\n{junk}\n")
    reads = tmp_path / "lib1.fq"
    with open(reads, "w") as fh:
        for i in range(300):
            s = int(rng.integers(0, len(A) - 100))
            fh.write(f"@r{i}\n{A[s:s+100]}\n+\n{'I'*100}\n")
    outdir = tmp_path / "out"
    assert covtools.decontaminate(
        [f"reads={reads}", f"ref={ref}", f"outdir={outdir}",
         "minl=100", "target=20", "mindepth=1",
         f"tmpdir={tmp_path / 'tmp'}"]) == 0
    clean = (outdir / "lib1_clean.fasta").read_text()
    dirty = (outdir / "lib1_dirty.fasta").read_text()
    assert ">contigA" in clean and ">contigJunk" not in clean
    assert ">contigJunk" in dirty
    assert (outdir / "lib1_covstats1.txt").exists()


def test_new_histograms(tmp_path):
    from bbmap_tpu.utils.readstats import ReadStats
    rs = ReadStats()
    bases = np.frombuffer(b"ACGTACGTAC" * 4, np.uint8).reshape(4, 10)
    qual = np.full((4, 10), 30, np.int8)
    qual[0, :5] = 10
    rs.add_batch(bases, qual, np.full(4, 10, np.int32))
    rs.add_match(b"mmmmSmmmmm")          # 1 error
    rs.add_match(b"mmmmmmmmmm")          # 0 errors
    rs.add_time(0.01, 4)
    e = tmp_path / "ehist.txt"
    b = tmp_path / "bqhist.txt"
    t = tmp_path / "timehist.txt"
    rs.write_ehist(str(e))
    rs.write_bqhist(str(b))
    rs.write_timehist(str(t))
    elines = dict(l.split("\t") for l in
                  e.read_text().splitlines()[1:])
    assert elines["0"] == "1" and elines["1"] == "1"
    brow = b.read_text().splitlines()[1].split("\t")
    assert brow[0] == "0" and brow[1] == "4"   # 4 reads at position 0
    assert brow[2] == "10" and brow[3] == "30"  # min/max quality
    assert len(t.read_text().splitlines()) == 2


@pytest.mark.slow
def test_bbmap_emits_new_hists(tmp_path):
    from bbmap_tpu.tools import bbmap as bb
    rng = np.random.default_rng(1)
    g = "".join("ACGT"[i] for i in rng.integers(0, 4, 20000))
    ref = tmp_path / "ref.fa"
    ref.write_text(f">s\n{g}\n")
    fq = tmp_path / "in.fq"
    with open(fq, "w") as fh:
        for i in range(50):
            s = int(rng.integers(0, len(g) - 100))
            fh.write(f"@r{i}\n{g[s:s+100]}\n+\n{'I'*100}\n")
    eh = tmp_path / "e.txt"
    bq = tmp_path / "bq.txt"
    th = tmp_path / "t.txt"
    assert bb.main([f"ref={ref}", f"in={fq}",
                    f"out={tmp_path/'o.sam'}", "nodisk",
                    f"ehist={eh}", f"bqhist={bq}",
                    f"timehist={th}"]) == 0
    assert eh.read_text().startswith("#Errors")
    assert bq.read_text().startswith("#BaseNum")
    assert th.read_text().startswith("#Time")
