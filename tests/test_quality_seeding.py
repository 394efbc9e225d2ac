"""Unified seeding semantics (VERDICT r1 #9): the device quickmap's
quality-probability key selection must match the host path bit-for-bit
(reference: QualityTools.makeKeyProbs:188-218 +
KeyRing.makeOffsets3:396-506, float32 like the Java)."""

import jax
import numpy as np
import pytest

from bbmap_tpu.align import quickmap_device as qd
from bbmap_tpu.align import seed
from bbmap_tpu.core.genome import Genome, Scaffold
from bbmap_tpu.index.build import analyze_index, build_index


@pytest.fixture(scope="module")
def index():
    rng = np.random.default_rng(0)
    bases4 = np.frombuffer(b"ACGT", np.uint8)
    g0 = rng.choice(bases4, size=50_000).astype(np.uint8)
    g = Genome(chroms=[g0], scaffolds=[
        Scaffold(chrom=1, sid=1, start=0, length=len(g0),
                 name="s")]).finalize()
    idx = build_index(g, 11)
    analyze_index(idx, 0.01)
    return idx, g0


def test_device_offsets_match_host(index):
    idx, g0 = index
    L = 100
    k = idx.k
    cfg = qd.make_config(idx, L)
    den2, den3 = seed.key_density_ladder(L, k)
    rng = np.random.default_rng(1)
    B = 128
    # mixed-quality rows: good, bad tails, N bases (q=0), low islands
    qual = rng.integers(2, 41, size=(B, L)).astype(np.int8)
    qual[::4, 70:] = 2                       # bad right tail
    qual[1::4, :15] = 2                      # bad left tail
    qual[2::4, 50] = 0                       # N in the middle
    qual[3::7] = 38                          # uniformly good

    fn = jax.jit(lambda q: qd.quality_offsets_stage(cfg, q, den2, den3))
    dev = np.asarray(fn(qual))
    nk = len(cfg.offsets_list)
    mismatches = 0
    for i in range(B):
        host = seed.make_offsets_quality(qual[i].astype(np.int64), L, k)
        dev_row = dev[i][dev[i] >= 0]
        if host is None:
            continue
        if not np.array_equal(np.asarray(host, np.int64),
                              dev_row.astype(np.int64)):
            mismatches += 1
            if mismatches <= 3:
                print("row", i, "host", host, "dev", dev_row)
    assert mismatches == 0


def test_quickmap_with_quality_maps(index):
    """End-to-end: quality-aware device seeding still maps reads whose
    low-quality tail would otherwise waste key slots."""
    idx, g0 = index
    L = 100
    run = qd.build_quickmap(idx, L)
    rng = np.random.default_rng(2)
    B = 32
    starts = rng.integers(0, len(g0) - L, size=B)
    reads = np.stack([g0[s:s + L] for s in starts])
    qual = np.full((B, L), 35, np.int8)
    # corrupt the last 20 bases AND mark them low quality
    bases4 = np.frombuffer(b"ACGT", np.uint8)
    for i in range(B):
        for p in range(L - 20, L):
            reads[i, p] = bases4[rng.integers(0, 4)]
        qual[i, L - 20:] = 2
    d = run(reads, qual).host()
    from bbmap_tpu.core import constants as K
    # all reads find their site (keys concentrated in the good prefix)
    ok = np.abs(d["best_diag"] - starts) <= 2
    assert ok.sum() >= 30, ok.sum()
