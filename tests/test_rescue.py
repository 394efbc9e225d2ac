"""Exact mate-rescue semantics (VERDICT r1 #7; reference:
AbstractMapThread.rescue:1144-1250, quickRescue:2303-2404)."""

import numpy as np
import pytest

from bbmap_tpu.align.pipeline import (BBMapAligner, MAX_RESCUE_DIST,
                                      MAX_RESCUE_MISMATCHES)
from bbmap_tpu.core.batch import ReadBatch
from bbmap_tpu.core.genome import Genome, Scaffold
from bbmap_tpu.index.build import analyze_index, build_index


@pytest.fixture(scope="module")
def aligner():
    rng = np.random.default_rng(7)
    bases4 = np.frombuffer(b"ACGT", np.uint8)
    g0 = rng.choice(bases4, size=60_000).astype(np.uint8)
    g = Genome(chroms=[g0], scaffolds=[
        Scaffold(chrom=1, sid=1, start=0, length=len(g0),
                 name="s1")]).finalize()
    idx = build_index(g, 11)
    analyze_index(idx, 0.01)
    return BBMapAligner(g, idx, device_quickmap=False), g0


def _pair_batches(g0, start, L, insert, n_err=0, rng=None):
    """FR innie pair at `start`, mate 2 heavily mutated (n_err subs)."""
    from bbmap_tpu.core.bases import COMP_ASCII
    r1 = g0[start:start + L].copy()
    m_start = start + L + insert
    fwd = g0[m_start:m_start + L].copy()
    if n_err:
        # evenly spaced errors: no clean run >= spacing, so no seed of
        # that length survives
        pos = np.linspace(5, L - 6, n_err).astype(int)
        bases4 = np.frombuffer(b"ACGT", np.uint8)
        for p in pos:
            fwd[p] = bases4[(np.nonzero(
                bases4 == fwd[p])[0][0] + 1) % 4]
    r2 = COMP_ASCII[fwd][::-1]
    mk = lambda rows: ReadBatch(
        bases=np.stack(rows), quality=None,
        lengths=np.full(len(rows), L, np.int32),
        ids=[str(i) for i in range(len(rows))],
        numeric_ids=np.arange(len(rows), dtype=np.int64))
    return mk([r1]), mk([r2]), m_start


def test_quick_rescue_finds_noisy_mate(aligner):
    """A mate with too many errors to seed (every k-mer broken) is still
    rescued by the anchor-directed scan and lands at the exact origin."""
    al, g0 = aligner
    rng = np.random.default_rng(3)
    L = 100
    # 9 errors spread ~every 11bp kill all k=11 seeds
    b1, b2, m_start = _pair_batches(g0, 21_000, L, 60, n_err=10)
    r1, r2 = al.map_pairs(b1, b2)
    assert r1[0].mapped
    assert r2[0].mapped
    assert r2[0].rescued
    assert r2[0].strand == 1
    assert abs(r2[0].start - m_start) <= 2
    # high-scoring rescue promotes the pair to proper (retain2, :1229)
    assert r2[0].paired and r1[0].paired


def test_rescue_disabled_when_pairing_fails(aligner):
    """reference :1146 — rescue skipped when <5% of retained reads
    mate."""
    al, g0 = aligner
    al2 = BBMapAligner(al.genome, al.index, device_quickmap=False)
    al2._mapped_retained = 5000
    al2._num_mated = 100   # 100*20 < 5000 -> rescue off
    rng = np.random.default_rng(4)
    L = 100
    b1, b2, m_start = _pair_batches(g0, 30_000, L, 60, n_err=10)
    r1, r2 = al2.map_pairs(b1, b2)
    assert r1[0].mapped
    assert not r2[0].rescued


def test_rescue_disabled_when_search_dist_too_large(aligner):
    """reference :1147 — searchDist > MAX_RESCUE_DIST skips rescue."""
    al, g0 = aligner
    al2 = BBMapAligner(al.genome, al.index, device_quickmap=False)
    al2.average_pair_dist = (MAX_RESCUE_DIST + 200) / 2  # 2*apd+100 > max
    rng = np.random.default_rng(5)
    L = 100
    b1, b2, m_start = _pair_batches(g0, 40_000, L, 60, n_err=10)
    r1, r2 = al2.map_pairs(b1, b2)
    assert not r2[0].rescued


def test_quick_rescue_scan_semantics(aligner):
    """Direct _quick_rescue: monotone mismatch acceptance + absdif
    tiebreak pick the planted site, reject sites over the mismatch
    bound."""
    al, g0 = aligner
    L = 60
    site = 10_000
    read = g0[site:site + L].copy()
    got = al._quick_rescue(read, site - 400, 900, True,
                           site - 30, MAX_RESCUE_MISMATCHES, 1)
    assert got is not None
    start, mm = got
    assert start == site and mm == 0
    # a read matching nothing nearby -> None under a small bound
    rng = np.random.default_rng(0)
    junk = np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, size=L)]
    got = al._quick_rescue(junk, site - 400, 900, True, site, 3, 1)
    assert got is None
