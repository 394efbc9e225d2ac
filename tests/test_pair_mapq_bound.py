"""Pin the escalated-pair MAPQ deviation (VERDICT r4 missing #6).

The fused paired path carries the pair-boost delta computed on GAPLESS
scores through the DP competition (fused_device.fused_stage eff =
max(gapless, dp) + delta), while the host-paired path re-derives the
boost from post-DP group scores (pipeline._pair_boost_fixed after
_escalate_columnar). On escalated rows the selection VALUE can differ
slightly, which moves MAPQ (stream/SamLine.java:1703-1721 model) while
flags/pos/CIGAR/NM stay identical.

This test bounds that divergence on a workload engineered to escalate
~25% of mates: positions, strands, match strings and mapped status must
agree everywhere; MAPQ must agree on non-escalated rows and stay within
a small bound elsewhere. Documented in docs/TOOLS.md ("Known
deviations").
"""

import numpy as np
import pytest

from bbmap_tpu.align.pipeline import BBMapAligner, MappedRead
from bbmap_tpu.core.batch import ReadBatch
from bbmap_tpu.core.genome import Genome, Scaffold
from bbmap_tpu.index.build import analyze_index, build_index
from bbmap_tpu.io import sam as samio


def _mk(genome_n=200_000, n_pairs=384, L=150, seed=3):
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    g = rng.choice(bases, genome_n).astype(np.uint8)
    insert = np.clip(rng.normal(250, 30, n_pairs).astype(np.int64),
                     2 * L + 10, 400)
    starts = rng.integers(0, genome_n - 450, n_pairs)
    W = L + 12
    idx1 = starts[:, None] + np.arange(W)
    r1 = g[idx1][:, :L].copy()
    s2 = starts + insert - L
    win2 = g[s2[:, None] + np.arange(W)]
    r2f = win2[:, :L].copy()

    # heavy error model so a large fraction of mates escalate
    def mutate(rows, wins):
        for i in range(len(rows)):
            r = rng.random()
            if r < 0.35:
                for _ in range(int(rng.integers(2, 6))):
                    p = int(rng.integers(0, L))
                    rows[i, p] = bases[int(rng.integers(0, 4))]
            elif r < 0.55:
                d = int(rng.integers(1, 8))
                p = int(rng.integers(10, L - 10))
                w = wins[i]
                rows[i] = np.concatenate(
                    [w[:p], w[p + d:p + d + (L - p)]])
        return rows

    r1 = mutate(r1, g[idx1])
    r2f = mutate(r2f, win2)
    from bbmap_tpu.core.bases import COMP_ASCII
    r2 = COMP_ASCII[r2f][:, ::-1]

    def mk(rows, lo=0):
        return ReadBatch(
            bases=np.ascontiguousarray(rows), quality=None,
            lengths=np.full(len(rows), L, np.int32),
            ids=[str(i) for i in range(lo, lo + len(rows))],
            numeric_ids=np.arange(lo, lo + len(rows), dtype=np.int64))

    genome = Genome(chroms=[g], scaffolds=[
        Scaffold(chrom=1, sid=1, start=0, length=genome_n,
                 name="chr1")]).finalize()
    index = build_index(genome, 13)
    analyze_index(index, 0.01)
    return BBMapAligner(genome, index), mk(r1), mk(r2), L


def test_escalated_pair_mapq_bounded():
    aligner, b1, b2, L = _mk()
    B = b1.size

    # snapshot the dynamic insert model so both paths boost with the
    # same apd (the fused run updates it; without the restore the two
    # paths legitimately differ through the deviation term)
    dyn = (aligner.average_pair_dist, aligner._num_mated,
           aligner._mapped_retained)

    # fused paired path
    mb1, mb2 = aligner.map_pairs_columnar(b1, b2)
    fused1 = [MappedRead() for _ in range(B)]
    fused2 = [MappedRead() for _ in range(B)]
    mb1.fill_objects(fused1)
    mb2.fill_objects(fused2)

    # host-paired path (unfused quickmap + host boost/escalation)
    (aligner.average_pair_dist, aligner._num_mated,
     aligner._mapped_retained) = dyn
    host1 = [MappedRead() for _ in range(B)]
    host2 = [MappedRead() for _ in range(B)]
    aligner._map_pairs_device(b1, b2, L, L, host1, host2)

    max_imp = aligner.profile.max_imperfect_score(L)
    diverged = 0
    n_mapped = 0
    for f, h in zip(fused1 + fused2, host1 + host2):
        assert f.mapped == h.mapped
        if not f.mapped:
            continue
        n_mapped += 1
        # position/strand/shape parity — the deviation is score-only
        assert f.chrom == h.chrom and f.strand == h.strand
        assert f.start == h.start, (f.start, h.start)
        if f.match is not None and h.match is not None:
            assert f.match == h.match
        mq_f = samio.to_mapq(f.score, L, True, f.ambiguous)
        mq_h = samio.to_mapq(h.score, L, True, h.ambiguous)
        if mq_f != mq_h:
            diverged += 1
    assert n_mapped > 0.9 * 2 * B
    # with the post-DP winner re-boost (_reboost_winner_pairs), the
    # boosted-score retention in _apply_dp_result, and the
    # positive-site pairing guard, the two paths agree exactly on this
    # escalation-heavy workload (was: up to 16 MAPQ apart)
    assert diverged == 0, (diverged, n_mapped)
