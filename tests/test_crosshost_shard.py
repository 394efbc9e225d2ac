"""Cross-host index sharding (VERDICT r4 missing #2 / BASELINE config
4): each host builds ONLY its genome-block shard of the CSR index
(index/build.build_index_shard) while every analysis decision follows
the exact global counts — a shard build must reproduce the full-index
build's per-block CSR and analysis limits bit for bit. The 2-process
end-to-end parity lives in tests/test_multiprocess.py."""

import numpy as np
import pytest

from bbmap_tpu.core.genome import Genome, Scaffold
from bbmap_tpu.index.build import (analyze_index, build_index,
                                   build_index_shard, shard_bounds)
from bbmap_tpu.parallel import sharded


def _genome(seed=11, n=120_000):
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    g1 = rng.choice(bases, size=n).astype(np.uint8)
    g2 = rng.choice(bases, size=n // 2).astype(np.uint8)
    # repeat family so exclusion/clumpy analysis has work; a tandem
    # clump so remove_clumpy fires
    unit = rng.choice(bases, size=300).astype(np.uint8)
    for at in (5_000, 31_000, 64_000, 99_000):
        g1[at:at + 300] = unit
    tan = rng.choice(bases, size=40).astype(np.uint8)
    clump = np.concatenate([np.tile(np.concatenate([tan, tan[:2]]), 80)])
    g1[70_000:70_000 + len(clump)] = clump
    return Genome(chroms=[g1, g2], scaffolds=[
        Scaffold(chrom=1, sid=1, start=0, length=len(g1), name="c1"),
        Scaffold(chrom=2, sid=2, start=0, length=len(g2), name="c2"),
    ]).finalize()


@pytest.mark.parametrize("n_shards", [2])
def test_shard_build_matches_full_build(n_shards):
    g = _genome()
    k = 11
    full = build_index(g, k)
    analyze_index(full, 0.01)
    sidx = sharded.shard_index(full, n_shards)

    for sid in range(n_shards):
        local, counts_global, bounds = build_index_shard(
            g, k, sid, n_shards)
        np.testing.assert_array_equal(bounds, sidx.bounds)
        # global counts == full-index per-key lengths (pre-analysis
        # compaction, so rebuild the full index fresh for comparison)
        full2 = build_index(g, k)
        np.testing.assert_array_equal(counts_global,
                                      np.diff(full2.starts))
        analyze_index(local, 0.01, lengths_global=counts_global)
        # analysis limits identical to the full build
        assert local.max_usable_length == full.max_usable_length
        assert local.max_usable_length2 == full.max_usable_length2
        assert local.limit_avg == full.limit_avg
        assert local.limit_avg2 == full.limit_avg2
        assert local.limit_shortest == full.limit_shortest
        assert local.points_per_site == full.points_per_site
        np.testing.assert_array_equal(local.counts_canonical,
                                      full.counts_canonical)
        # per-block CSR identical to shard_index's decomposition of the
        # full (post-analysis) index
        np.testing.assert_array_equal(
            local.starts.astype(np.int64),
            sidx.starts_s[sid].astype(np.int64))
        n_local = int(local.starts[-1])
        np.testing.assert_array_equal(
            local.sites, sidx.sites_s[sid][:n_local])
        # the shard really is partial
        assert n_local < int(full.starts[-1])


def test_shard_bounds_chrom_aligned():
    g = _genome()
    G = len(g.packed_codes()[0])
    offs = np.asarray(g.packed_codes()[1], np.int64)
    b = shard_bounds(G, offs, 2)
    # interior bounds are STRICTLY chrom boundaries (reference
    # CHROMS_PER_BLOCK: a block never cuts a chrom — a mid-chrom split
    # can cut a candidate chain in two and flip ambiguity)
    assert b[1] in offs
    with pytest.raises(ValueError):
        shard_bounds(G, offs, 3)  # only 2 chrom blocks exist
