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


def test_packed_quality_path_bit_equal(index):
    """Palette-packed quality (pack_quality_host / 4-bit nibbles +
    16-way select chains) must reproduce the raw-int8 program
    bit-for-bit: offsets, greedy weights, and probAllErrors rejection."""
    idx, g0 = index
    L = 100
    cfg = qd.make_config(idx, L)
    den2, den3 = seed.key_density_ladder(L, idx.k)
    rng = np.random.default_rng(7)
    B = 96
    levels = np.array([0, 2, 9, 12, 22, 27, 32, 37], np.int8)
    qual = levels[rng.integers(0, len(levels), (B, L))]
    qual[::5, 60:] = 2

    o1, w1, r1 = jax.jit(
        lambda q: qd.quality_offsets_stage(cfg, q, den2, den3,
                                           return_weights=True))(qual)
    qpack, pal, pcp = qd.pack_quality_host(qual, L)
    assert qpack is not None
    o2, w2, r2 = jax.jit(
        lambda a, b, c: qd.quality_offsets_stage_packed(
            cfg, a, b, c, den2, den3, return_weights=True))(
        qpack, pal, pcp)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    # 17+ distinct values: pack declines, callers take the raw path
    many = rng.integers(0, 41, (4, L)).astype(np.int8)
    assert qd.pack_quality_host(many, L)[0] is None


def test_fused_quality_variants_identical(index, monkeypatch):
    """End-to-end: the fused program's qh (host-C offsets/scores), q4
    (palette-packed) and q8 (raw) variants produce identical mapping
    results on a binned batch."""
    idx, g0 = index
    from bbmap_tpu.align import fused_device
    from bbmap_tpu.io import native
    import bbmap_tpu.align.quickmap_device as qdm

    L = 100
    B = 64
    rng = np.random.default_rng(9)
    starts = rng.integers(0, len(g0) - L, size=B)
    reads = np.stack([g0[s:s + L] for s in starts])
    levels = np.array([2, 12, 23, 37], np.int8)
    qual = levels[rng.integers(0, 4, (B, L))]

    run = fused_device.build_fused(idx, L, B)
    outs = {}
    if native.get_lib() is not None:
        outs["qh"] = run(reads, qual).host()
    monkeypatch.setattr(native, "quality_offsets_scores",
                        lambda *a, **k: None)
    outs["q4"] = run(reads, qual).host()
    monkeypatch.setattr(qdm, "pack_quality_host",
                        lambda q, L: (None, None, None))
    outs["q8"] = run(reads, qual).host()
    ref = outs["q8"]
    for name, d in outs.items():
        for key in ("best_score", "best_diag", "best_strand",
                    "second_score", "n_good"):
            np.testing.assert_array_equal(d[key], ref[key],
                                          f"{name}:{key}")
    assert "qh" in outs, "native path not exercised"


def test_native_offsets_scores_bit_equal_device(index):
    """The csrc quality_offsets_scores host twin must be bit-identical
    to the device stage: offsets, float32 weights, probAllErrors
    rejection (mixed fixture incl. degraded rows, pae-reject rows, q0
    bases, and division ulp-edges — the d2/interval divisions resolve
    through host-semantics tables on device)."""
    from bbmap_tpu.io import native
    if native.get_lib() is None:
        pytest.skip("native lib unavailable")
    idx, g0 = index
    L = 150
    k = idx.k
    cfg = qd.make_config(idx, L)
    den2, den3 = seed.key_density_ladder(L, k)
    rng = np.random.default_rng(5)
    B = 2048
    lv = np.array([0, 2, 9, 12, 16, 22, 27, 32, 37], np.int8)
    qual = lv[rng.integers(0, len(lv), (B, L))]
    qual[::5, 60:] = 2
    qual[::17] = 2
    qual[3::31, 30:46] = 8
    o1, w1, r1 = [np.asarray(x) for x in jax.jit(
        lambda q: qd.quality_offsets_stage(cfg, q, den2, den3,
                                           return_weights=True))(qual)]
    a = 100 * k
    res = native.quality_offsets_scores(
        qual, L, k, seed.PROB_CORRECT,
        np.asarray(cfg.offsets_list, np.int32), den3, a)
    assert res is not None
    o2, s2, r2 = res
    inv = np.float32(1.0) / np.float32(a)
    np.testing.assert_array_equal(o1, o2.astype(np.int32))
    np.testing.assert_array_equal(w1, s2.astype(np.float32) * inv)
    np.testing.assert_array_equal(r1, r2)
    assert r1.sum() > 0 and (o1 < 0).any()
