"""Fused paired device path: pair-boost parity vs the host
_pair_boost_fixed, device quickRescue parity vs the host oracle, and
end-to-end paired mapping sanity vs truth."""
import numpy as np
import pytest

from bbmap_tpu.align.pipeline import BBMapAligner, MappedRead
from bbmap_tpu.core.batch import ReadBatch
from bbmap_tpu.core.genome import Genome, Scaffold
from bbmap_tpu.core.bases import COMP_ASCII
from bbmap_tpu.index.build import analyze_index, build_index


def _mkgenome(n=60000, seed=3):
    rng = np.random.default_rng(seed)
    g = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=n).astype(
        np.uint8)
    return g


@pytest.fixture(scope="module")
def setup():
    g = _mkgenome()
    genome = Genome(chroms=[g], scaffolds=[
        Scaffold(chrom=1, sid=1, start=0, length=len(g),
                 name="ref")]).finalize()
    index = build_index(genome, 13)
    analyze_index(index, 0.01)
    return g, genome, index


def _make_pairs(g, B, L=100, insert=180, seed=5, mut=True):
    rng = np.random.default_rng(seed)
    starts = rng.integers(0, len(g) - insert - 5, size=B)
    r1 = np.stack([g[s:s + L] for s in starts]).copy()
    r2f = np.stack([g[s + insert - L:s + insert] for s in starts])
    r2 = COMP_ASCII[r2f][:, ::-1].copy()
    if mut:
        bases = np.frombuffer(b"ACGT", np.uint8)
        for i in range(B):
            if rng.random() < 0.3:
                for _ in range(rng.integers(1, 4)):
                    r1[i, rng.integers(0, L)] = bases[rng.integers(0, 4)]
            if rng.random() < 0.3:
                for _ in range(rng.integers(1, 4)):
                    r2[i, rng.integers(0, L)] = bases[rng.integers(0, 4)]
    return r1, r2, starts


def _batch(rows, L):
    B = len(rows)
    return ReadBatch(bases=rows, quality=None,
                     lengths=np.full(B, L, np.int32),
                     ids=[str(i) for i in range(B)],
                     numeric_ids=np.arange(B, dtype=np.int64))


def test_pair_boost_device_matches_host(setup):
    import jax.numpy as jnp
    from bbmap_tpu.align import fused_device as fdev
    g, genome, index = setup
    al = BBMapAligner(genome, index)
    rng = np.random.default_rng(7)
    B, C = 64, 8
    L = 100
    mk = lambda lo, hi: rng.integers(lo, hi, (B, C)).astype(np.int32)
    d = {}
    for m in (1, 2):
        d[m] = {
            "cand_scores": np.where(rng.random((B, C)) < 0.2,
                                    -(2 ** 30), mk(-500, 10000)),
            "cand_start": mk(0, len(g) - 200),
            "cand_spread": mk(0, 40),
            "cand_strand": mk(0, 2),
        }
    b1h, b2h = al._pair_boost_fixed(d[1], d[2], L, L)
    gl = jnp.asarray(np.vstack([d[1]["cand_scores"],
                                d[2]["cand_scores"]]).astype(np.int32))
    cand = {k: jnp.asarray(np.vstack(
        [d[1]["cand_" + k], d[2]["cand_" + k]]).astype(np.int32))
        for k in ("start", "spread", "strand")}
    out = np.asarray(fdev.pair_boost_device(
        gl, cand, B, L, L, jnp.int32(int(al.average_pair_dist)),
        jnp.asarray(al.chrom_offsets.astype(np.int32))))
    np.testing.assert_array_equal(out[:B], np.maximum(b1h, -(2 ** 30)))
    np.testing.assert_array_equal(out[B:], np.maximum(b2h, -(2 ** 30)))


def test_rescue_device_matches_host_oracle(setup):
    from bbmap_tpu.ops import rescue_device
    from bbmap_tpu.align.quickmap_device import _B2C
    g, genome, index = setup
    al = BBMapAligner(genome, index)
    rng = np.random.default_rng(11)
    Lm = 100
    R = 64
    N_OFF = 1536
    reads = np.zeros((R, Lm), np.uint8)
    lo_a = np.zeros(R, np.int32)
    n_a = np.zeros(R, np.int32)
    ik_a = np.zeros(R, np.int32)
    rt_a = np.zeros(R, bool)
    mm_a = np.zeros(R, np.int32)
    expected = []
    gref = al.codes_ascii
    for t in range(R):
        src = int(rng.integers(8200, len(gref) - 8200 - Lm))
        read = gref[src:src + Lm].copy()
        nmut = int(rng.integers(0, 8))
        for _ in range(nmut):
            read[rng.integers(0, Lm)] = ord("ACGT"[rng.integers(0, 4)])
        if rng.random() < 0.1:
            read[rng.integers(0, Lm)] = ord("N")
        right = bool(rng.random() < 0.5)
        span = int(rng.integers(200, 1200))
        if right:
            lo = src - int(rng.integers(0, 150))
            hi = lo + span
            loc, sdist, ideal = lo, span, src + int(rng.integers(-60, 60))
        else:
            hi = src + int(rng.integers(0, 150))
            lo = hi - span
            loc, sdist, ideal = hi, span, src + int(rng.integers(-60, 60))
        lo = max(0, lo)
        hi = min(len(gref) - Lm, hi)
        n = hi - lo + 1
        max_mm = int(rng.integers(2, 20))
        host = al._quick_rescue(read, loc, sdist, right, ideal, max_mm,
                                1)
        expected.append(host)
        reads[t] = _B2C[read]
        lo_a[t] = lo
        n_a[t] = n
        ik_a[t] = ideal - lo
        rt_a[t] = right
        mm_a[t] = max_mm
    run = rescue_device.build_rescue(index, Lm, R, N_OFF)
    best_k, min_mm = run(reads, lo_a, n_a, ik_a, rt_a, mm_a)
    for t in range(R):
        if expected[t] is None:
            assert best_k[t] < 0, t
        else:
            start = (lo_a[t] + best_k[t]) if rt_a[t] \
                else (lo_a[t] + (n_a[t] - 1) - best_k[t])
            assert best_k[t] >= 0, t
            assert (int(start), int(min_mm[t])) == expected[t], t


@pytest.mark.slow
def test_map_pairs_columnar_end_to_end(setup):
    g, genome, index = setup
    al = BBMapAligner(genome, index)
    L = 100
    B = 256
    r1, r2, starts = _make_pairs(g, B, L=L)
    out = al.map_pairs_columnar(_batch(r1, L), _batch(r2, L))
    assert out is not None
    mb1, mb2 = out
    pad = genome.start_pad if hasattr(genome, "start_pad") else 0
    m1 = mb1.mapped.mean()
    m2 = mb2.mapped.mean()
    assert m1 > 0.97 and m2 > 0.97, (m1, m2)
    # positional truth for mate 1 (allow clipping slack)
    flat1 = al.chrom_offsets[mb1.chrom - 1] + mb1.start
    truth1 = starts + (al.chrom_offsets[0] if len(al.chrom_offsets) else 0)
    ok = mb1.mapped & (np.abs(flat1 - (truth1 + flat1[0] - flat1[0])) >= 0)
    # strict: within 5 bp of sampled start (chrom-flat)
    t0 = flat1[mb1.mapped] - starts[mb1.mapped]
    off = np.bincount((t0 - t0.min()).astype(np.int64)).argmax() + t0.min()
    frac = np.mean(np.abs(t0 - off) <= 5)
    assert frac > 0.97, frac
    assert mb1.paired.mean() > 0.9
    # proper-pair flags symmetric
    np.testing.assert_array_equal(mb1.paired, mb2.paired)


def test_map_pairs_columnar_rescue(setup):
    """Mate 2 made unmappable by heavy mutation except via rescue; the
    device rescue must recover it near the anchor."""
    g, genome, index = setup
    al = BBMapAligner(genome, index)
    L = 100
    B = 128
    r1, r2, starts = _make_pairs(g, B, L=L, mut=False)
    rng = np.random.default_rng(13)
    # destroy the seeds of mate 2 on some rows: mutate every 11th base so
    # no 13-mer survives, but 90% of bases still match (rescuable)
    broken = rng.random(B) < 0.3
    flip = {ord("A"): ord("C"), ord("C"): ord("G"),
            ord("G"): ord("T"), ord("T"): ord("A")}
    for i in np.nonzero(broken)[0]:
        fwd = COMP_ASCII[r2[i][::-1]].copy()  # genome-forward
        for p in range(5, L, 9):              # gaps < k: no seed survives
            fwd[p] = flip[int(fwd[p])]
        r2[i] = COMP_ASCII[fwd][::-1]
    out = al.map_pairs_columnar(_batch(r1, L), _batch(r2, L))
    assert out is not None
    mb1, mb2 = out
    resc = mb2.rescued[broken]
    # most broken mates recovered by rescue
    assert mb2.mapped[broken].mean() > 0.8, mb2.mapped[broken].mean()
    assert resc.mean() > 0.5, resc.mean()


def test_map_pairs_object_path_agrees(setup):
    """map_pairs (object API) routes through the columnar path and
    produces consistent flags/coords."""
    g, genome, index = setup
    al = BBMapAligner(genome, index)
    L = 100
    B = 64
    r1, r2, starts = _make_pairs(g, B, L=L, seed=17)
    res1, res2 = al.map_pairs(_batch(r1, L), _batch(r2, L))
    assert sum(r.mapped for r in res1) > 0.95 * B
    assert sum(r.paired for r in res1) > 0.85 * B
    for a, b in zip(res1, res2):
        assert a.paired == b.paired
