"""Tadpole2: K>31 (ukmer-backed) assembly, extension, and correction
(VERDICT r2 missing #7; reference: assemble/Tadpole2.java over
KmerTableSetU)."""

import numpy as np

from bbmap_tpu.core.bases import COMP_ASCII
from bbmap_tpu.tools import tadpole


def _genome(rng, n=3000):
    bases = np.frombuffer(b"ACGT", np.uint8)
    return bytes(rng.choice(bases, n))


def _reads(rng, genome, n_reads, L=120, err=0.0):
    bases = np.frombuffer(b"ACGT", np.uint8)
    out = []
    for i in range(n_reads):
        at = int(rng.integers(0, len(genome) - L))
        row = np.frombuffer(genome[at:at + L], np.uint8).copy()
        ne = int(err * L)
        for _ in range(ne):
            row[int(rng.integers(0, L))] = bases[int(rng.integers(0, 4))]
        if rng.random() < 0.5:
            row = COMP_ASCII[row][::-1]
        out.append((f"r{i}", bytes(row)))
    return out


def _write_fq(path, reads):
    with open(path, "w") as f:
        for rid, b in reads:
            f.write(f"@{rid}\n{b.decode()}\n+\n{'I' * len(b)}\n")


def test_assemble_big_reconstructs_genome(tmp_path):
    rng = np.random.default_rng(1)
    g = _genome(rng, 2000)
    reads = _reads(rng, g, 600, L=120)
    fq = tmp_path / "r.fq"
    _write_fq(fq, reads)
    out = tmp_path / "contigs.fa"
    rc = tadpole.main([f"in={fq}", f"out={out}", "k=40",
                       "mode=contig", "mincountseed=3",
                       "mincountextend=2", "mincontig=200"])
    assert rc == 0
    seqs = []
    cur = []
    for line in out.read_text().splitlines():
        if line.startswith(">"):
            if cur:
                seqs.append("".join(cur))
            cur = []
        else:
            cur.append(line)
    if cur:
        seqs.append("".join(cur))
    assert seqs, "no contigs assembled"
    # the longest contig should cover most of the genome in one piece
    longest = max(seqs, key=len)
    gs = g.decode()
    grc = bytes(COMP_ASCII[np.frombuffer(g, np.uint8)][::-1]).decode()
    assert len(longest) > 1500
    assert longest in gs or longest in grc


def test_assemble_big_matches_small_k_structure(tmp_path):
    """k=31 and k=40 assemblies of clean high-coverage reads both
    reconstruct the genome (structural agreement between Tadpole1 and
    Tadpole2 paths)."""
    rng = np.random.default_rng(2)
    g = _genome(rng, 1500)
    reads = _reads(rng, g, 500, L=100)
    fq = tmp_path / "r.fq"
    _write_fq(fq, reads)
    lens = {}
    for k in (31, 40):
        out = tmp_path / f"c{k}.fa"
        assert tadpole.main([f"in={fq}", f"out={out}", f"k={k}",
                             "mincontig=300"]) == 0
        body = "".join(l for l in out.read_text().splitlines()
                       if not l.startswith(">"))
        lens[k] = len(body)
    assert abs(lens[31] - lens[40]) < 100


def test_extend_big(tmp_path):
    rng = np.random.default_rng(3)
    g = _genome(rng, 1200)
    reads = _reads(rng, g, 400, L=100)
    fq = tmp_path / "r.fq"
    _write_fq(fq, reads)
    frag = tmp_path / "frag.fa"
    frag.write_text(">f\n" + g[500:600].decode() + "\n")
    out = tmp_path / "ext.fa"
    assert tadpole.main([f"in={frag}", f"out={out}", "k=40",
                         "mode=extend", f"extra={fq}", "el=50"]) == 0
    body = "".join(l for l in out.read_text().splitlines()
                   if not l.startswith(">"))
    assert len(body) >= 180        # extended ~50 both ways
    assert body in g.decode()


def test_correct_big(tmp_path):
    rng = np.random.default_rng(4)
    g = _genome(rng, 1200)
    reads = _reads(rng, g, 500, L=100)
    fq = tmp_path / "r.fq"
    _write_fq(fq, reads)
    # one read with a single error in the middle
    bad = bytearray(g[300:400])
    orig = bad[50]
    bad[50] = ord("A") if orig != ord("A") else ord("C")
    br = tmp_path / "bad.fq"
    _write_fq(br, [("bad", bytes(bad))])
    out = tmp_path / "fix.fq"
    assert tadpole.main([f"in={br}", f"out={out}", "k=40",
                         "mode=correct", f"extra={fq}"]) == 0
    fixed = out.read_text().splitlines()[1]
    assert fixed == g[300:400].decode()


def test_shave_rinse_big():
    """A low-count hair hanging off a solid path is removed."""
    from bbmap_tpu.index.kmer_big import KmerCounterBig
    rng = np.random.default_rng(5)
    g = _genome(rng, 300)
    k = 40
    c = KmerCounterBig(k)
    trunk = np.frombuffer(g, np.uint8)[None, :]
    for _ in range(5):
        c.add_batch(trunk)
    # hair: branch off position 100 with 1x coverage
    hair = bytearray(g[61:141])
    hair[-1] = ord("A") if hair[-1] != ord("A") else ord("C")
    c.add_batch(np.frombuffer(bytes(hair), np.uint8)[None, :])
    hi, lo, counts = c.finish()
    n0 = len(counts)
    h2, l2, c2 = tadpole.shave_rinse_big(hi, lo, counts, k,
                                         max_depth=k + 2)
    assert len(c2) < n0
    assert (c2 > 1).all() or len(c2) == n0 - 1