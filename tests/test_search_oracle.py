"""Reference-faithful key retention: the host oracle
(align/search_oracle.py — staged re-admission + Solver-weighted greedy
trim, a literal re-derivation of BBIndex.find:403-505 + Solver.java) vs
the vectorized device implementation (quickmap_device._ref_retention),
on a repeat-heavy genome where the heuristics actually fire."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bbmap_tpu.align import search_oracle as so
from bbmap_tpu.align import quickmap_device as qd
from bbmap_tpu.align import seed as seed_host
from bbmap_tpu.core.genome import Genome, Scaffold
from bbmap_tpu.index.build import analyze_index, build_index


def _repeat_genome(n=300_000, seed=21):
    """Heavy repeat content so greedy trimming + staged re-admission
    have work: a 400 bp unit implanted 60x (some diverged), plus a 2 kbp
    unit 12x."""
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    g = rng.choice(bases, size=n).astype(np.uint8)
    unit = rng.choice(bases, size=400).astype(np.uint8)
    for i in range(60):
        at = int(rng.integers(0, n - 400))
        u = unit.copy()
        for _ in range(i % 5):
            u[rng.integers(0, 400)] = bases[rng.integers(0, 4)]
        g[at:at + 400] = u
    unit2 = rng.choice(bases, size=2000).astype(np.uint8)
    for i in range(12):
        at = int(rng.integers(0, n - 2000))
        g[at:at + 2000] = unit2
    return g


@pytest.fixture(scope="module")
def setup():
    g = _repeat_genome()
    genome = Genome(chroms=[g], scaffolds=[
        Scaffold(chrom=1, sid=1, start=0, length=len(g),
                 name="rep")]).finalize()
    index = build_index(genome, 13)
    analyze_index(index, 0.03)
    assert index.counts_canonical is not None
    return g, genome, index


def _reads(g, B, L, seed=5):
    rng = np.random.default_rng(seed)
    starts = rng.integers(0, len(g) - L - 1, size=B)
    return np.stack([g[s:s + L] for s in starts])


def test_limits_derived(setup):
    g, genome, index = setup
    assert index.limit_avg >= 20
    assert index.limit_avg2 >= index.limit_avg
    assert index.points_per_site <= -1
    assert index.length_histogram is not None


def test_device_retention_matches_oracle(setup):
    g, genome, index = setup
    L = 150
    B = 512
    reads = _reads(g, B, L)
    cfg = qd.make_config(index, L)
    assert cfg.ref_admit
    offsets = np.asarray(cfg.offsets_list, np.int32)
    nk = len(offsets)
    ccnt_d = qd.ccnt_array(index)

    def prog(bases, ccnt):
        rcodes = qd.ascii_to_codes(bases)
        kp = qd._keys_from_codes(rcodes, cfg.offsets_list, cfg.k, L)
        ccnt_p = qd.take_flat(ccnt, jnp.where(kp < 0, 0, kp))
        ccnt_p = jnp.where(kp < 0, 0, ccnt_p)
        off_p = jnp.broadcast_to(
            jnp.asarray(offsets), kp.shape).astype(jnp.int32)
        alive = qd._ref_retention(cfg, kp, off_p, ccnt_p)
        return kp, alive

    kp, alive = jax.jit(prog)(jnp.asarray(reads), ccnt_d)
    kp = np.asarray(kp)
    alive = np.asarray(alive)

    key_scores = np.full(nk, 100 * index.k, np.int32)  # no-quality: 1.0
    n_nontrivial = 0
    for r in range(B):
        keys_o, offs_o, _sc = so.retain_keys(
            kp[r].astype(np.int64), offsets.astype(np.int64),
            key_scores, index)
        dev_keys = kp[r][alive[r]]
        np.testing.assert_array_equal(
            np.sort(dev_keys), np.sort(keys_o),
            err_msg=f"read {r}: device {dev_keys} oracle {keys_o}")
        if len(keys_o) < np.count_nonzero(kp[r] >= 0):
            n_nontrivial += 1
    # the fixture must actually exercise trimming/readmission
    assert n_nontrivial > B // 10, n_nontrivial


def test_oracle_readmission_and_device_parity_on_crafted_keys(setup):
    """Key sets crafted to straddle maxLen exercise every re-admission
    tier; the device must match the oracle on them too."""
    g, genome, index = setup
    rng = np.random.default_rng(9)
    counts = index.counts_canonical
    maxLen = index.max_usable_length
    cfg = qd.make_config(index, 150)
    offsets = np.asarray(cfg.offsets_list, np.int64)
    nk = len(offsets)
    key_scores = np.full(nk, 100 * index.k, np.int32)
    # pools: keys whose canonical count falls in each tier band
    c = counts.astype(np.int64)
    pools = [np.nonzero((c > 0) & (c < maxLen))[0],
             np.nonzero((c >= maxLen) & (c < (maxLen * 3) // 2))[0],
             np.nonzero((c >= (maxLen * 3) // 2) & (c < maxLen * 2))[0],
             np.nonzero((c >= maxLen * 2) & (c < maxLen * 5))[0],
             np.nonzero(c >= maxLen * 5)[0]]
    assert len(pools[0]) > nk
    rows = []
    for trial in range(64):
        keys = np.full(nk, -1, np.int64)
        n_base = int(rng.integers(0, 5))       # few base-tier hits
        picks = rng.choice(len(pools[0]), size=max(n_base, 1),
                           replace=False)
        slots = rng.choice(nk, size=nk, replace=False)
        si = 0
        for p in picks[:n_base]:
            keys[slots[si]] = pools[0][p]
            si += 1
        for band in (1, 2, 3, 4):
            if len(pools[band]) == 0:
                continue
            for _ in range(int(rng.integers(0, 4))):
                if si >= nk:
                    break
                keys[slots[si]] = pools[band][int(
                    rng.integers(0, len(pools[band])))]
                si += 1
        rows.append(keys)
    kp = np.stack(rows).astype(np.int32)
    B = kp.shape[0]

    ccnt_d = qd.ccnt_array(index)

    def prog(kp_in, ccnt):
        ccnt_p = qd.take_flat(ccnt, jnp.where(kp_in < 0, 0, kp_in))
        ccnt_p = jnp.where(kp_in < 0, 0, ccnt_p)
        off_p = jnp.broadcast_to(
            jnp.asarray(offsets.astype(np.int32)),
            kp_in.shape).astype(jnp.int32)
        return qd._ref_retention(cfg, kp_in, off_p, ccnt_p)

    alive = np.asarray(jax.jit(prog)(jnp.asarray(kp), ccnt_d))
    readmitted = 0
    for r in range(B):
        keys_o, _, _ = so.retain_keys(kp[r].astype(np.int64),
                                      offsets, key_scores, index)
        dev_keys = kp[r][alive[r]]
        np.testing.assert_array_equal(np.sort(dev_keys),
                                      np.sort(keys_o), err_msg=str(r))
        base = sum(1 for key in kp[r] if key >= 0
                   and 0 < c[key] < maxLen)
        if len(keys_o) > base:
            readmitted += 1
    assert readmitted > 0, "fixture never fired the re-admission ladder"


def test_device_retention_matches_oracle_with_quality(setup):
    """keyProbs-derived greedy weights (VERDICT r4 missing #1): with
    quality-bearing reads the device must reproduce the oracle's
    weighted greedy trim key-for-key, including the float32
    valuep*weight truncation and the probAllErrors read rejection
    (reference: AbstractMapThread.java:679,704-727 +
    BBIndex.java:268-270,337,459)."""
    g, genome, index = setup
    L = 150
    B = 512
    rng = np.random.default_rng(17)
    reads = _reads(g, B, L, seed=6)
    # quality: plateau + sagging tail + frequent deep dips so weights
    # differ across keys and some reads trip probAllErrors
    pos = np.arange(L)
    q = 38.0 - 10.0 * (pos / L) ** 2 + rng.normal(0, 3, (B, L))
    dips = rng.random((B, L)) < 0.06
    q = np.where(dips, rng.uniform(0, 12, (B, L)), q)
    # a handful of nearly-hopeless reads for the rejection path: q2
    # everywhere except one short q8 window, so offset selection
    # SUCCEEDS (key probs ~0.89 < errorLimit1 inside the window) but
    # the probAllErrors product stays > 0.5 (reference drops these,
    # AbstractMapThread.java:723; fully-hopeless reads instead fail
    # offset selection and take the documented ladder fallback)
    bad = rng.choice(B, size=12, replace=False)
    q[bad] = 2.0
    for r in bad:
        at = int(rng.integers(0, L - 16))
        q[r, at:at + 16] = 8.0
    q = np.clip(q, 0, 41).astype(np.int8)

    cfg = qd.make_config(index, L)
    assert cfg.ref_admit
    den2, den3 = seed_host.key_density_ladder(L, index.k)
    ccnt_d = qd.ccnt_array(index)

    def prog(bases, qual, ccnt):
        rcodes = qd.ascii_to_codes(bases)
        offs, wts, rej = qd.quality_offsets_stage(
            cfg, qual, den2, den3, return_weights=True)
        keys_all = qd._keys_all_positions(rcodes, cfg.k, L)
        od = offs.astype(jnp.int32)
        kp = qd.take_along_flat(keys_all, jnp.clip(od, 0, L - cfg.k))
        kp = jnp.where(od < 0, -1, kp)
        kp = jnp.where(rej[:, None], -1, kp)
        ccnt_p = qd.take_flat(ccnt, jnp.where(kp < 0, 0, kp))
        ccnt_p = jnp.where(kp < 0, 0, ccnt_p)
        off_p = jnp.maximum(od, 0)
        alive = qd._ref_retention(cfg, kp, off_p, ccnt_p, weights=wts)
        return offs, rej, kp, alive

    offs, rej, kp, alive = jax.jit(prog)(
        jnp.asarray(reads), jnp.asarray(q), ccnt_d)
    offs = np.asarray(offs)
    rej = np.asarray(rej)
    kp = np.asarray(kp)
    alive = np.asarray(alive)

    n_rejected = int(rej.sum())
    n_weight_differs = 0
    n_trimmed = 0
    for r in range(B):
        act = offs[r] >= 0
        off_r = offs[r][act].astype(np.int64)
        scores, pae = so.key_scores_from_quality(q[r], off_r, index.k)
        if len(np.unique(scores)) > 1:
            n_weight_differs += 1
        # device rejection must equal the oracle's probAllErrors rule
        # (fallback-ladder reads are never rejected — both sides use
        # the real probs at the chosen offsets, so pae matches)
        if rej[r]:
            assert pae > 0.5, f"read {r}: device rejected, pae={pae}"
            assert not alive[r].any()
            continue
        keys_r = kp[r][act].astype(np.int64)
        keys_o, _offs_o, _sc = so.retain_keys(keys_r, off_r, scores,
                                              index)
        dev_keys = kp[r][alive[r]]
        np.testing.assert_array_equal(
            np.sort(dev_keys), np.sort(keys_o),
            err_msg=f"read {r}: device {dev_keys} oracle {keys_o}")
        if len(keys_o) < np.count_nonzero(keys_r >= 0):
            n_trimmed += 1
    assert n_rejected >= 1, "fixture never tripped probAllErrors"
    assert n_weight_differs > B // 2, n_weight_differs
    assert n_trimmed > B // 20, n_trimmed


def test_key_scores_reference_formula():
    """Spot-check the keyScores arithmetic against hand-computed
    reference values (a=1300 for k=13: baseKeyScore=162, range=1138)."""
    q = np.full(30, 40, np.int8)
    offs = np.array([0, 5, 17], np.int64)
    scores, pae = so.key_scores_from_quality(q, offs, 13)
    # q40 over 13 bases: perr=1e-4 each; keyProb = 1-(1-1e-4)^13
    p = np.float32(1.0 - (1.0 - 1e-4) ** 13)
    expect = 162 + int(np.floor(np.float32(1138) * (np.float32(1.0) - p)
                                + np.float32(0.5)))
    assert list(scores) == [expect] * 3
    assert pae == pytest.approx(float(p) ** 3, rel=1e-5)
    # q0 bases force keyProb 1.0 -> baseKeyScore and pae 1.0
    q2 = np.zeros(30, np.int8)
    scores2, pae2 = so.key_scores_from_quality(q2, offs, 13)
    assert list(scores2) == [162] * 3
    assert pae2 == 1.0


def test_bench_genome_retention_stats():
    """On the bench-style genome the reference retention keeps most
    unique-region keys and the admitted totals fit the device slot
    budget for nearly every read (the budget cap is the documented
    deviation — quantified here)."""
    rng = np.random.default_rng(3)
    bases = np.frombuffer(b"ACGT", np.uint8)
    g = rng.choice(bases, size=800_000).astype(np.uint8)
    unit = rng.choice(bases, size=1200).astype(np.uint8)
    for _ in range(10):
        at = int(rng.integers(0, len(g) - 1200))
        g[at:at + 1200] = unit
    genome = Genome(chroms=[g], scaffolds=[
        Scaffold(chrom=1, sid=1, start=0, length=len(g),
                 name="b")]).finalize()
    index = build_index(genome, 13)
    analyze_index(index, 0.01)
    L = 150
    B = 256
    reads = _reads(g, B, L, seed=8)
    cfg = qd.make_config(index, L)
    offsets = np.asarray(cfg.offsets_list, np.int64)
    key_scores = np.full(len(offsets), 100 * index.k, np.int32)
    from bbmap_tpu.index.build import rolling_keys
    over = 0
    kept_frac = []
    for r in range(B):
        codes = np.array([qd._B2C[c] for c in reads[r]], np.uint8)
        kk, valid = rolling_keys(codes, index.k)
        keys = np.where(valid[offsets], kk[offsets], -1)
        keys_o, _, _ = so.retain_keys(keys, offsets, key_scores, index)
        nvalid = int((keys >= 0).sum())
        if nvalid:
            kept_frac.append(len(keys_o) / nvalid)
        tot = sum(int(index.counts_canonical[key]) for key in keys_o)
        if tot > qd.SLOT_BUDGET:
            over += 1
    assert np.mean(kept_frac) > 0.9
    assert over < B // 10, over
