"""Staged re-admission of over-long site lists (VERDICT r1 #4;
reference: BBIndex.find:421-440 — reads hitting too few keys at the
base cap re-search with 1.5x/2x/3x/5x longer lists admitted)."""

import jax
import numpy as np

from bbmap_tpu.align import quickmap_device as qd
from bbmap_tpu.core.genome import Genome, Scaffold
from bbmap_tpu.index.build import analyze_index, build_index


def _mk_index(rng, n_copies):
    bases4 = np.frombuffer(b"ACGT", np.uint8)
    unit = rng.choice(bases4, size=80).astype(np.uint8)
    parts = [rng.choice(bases4, size=3000).astype(np.uint8)]
    for _ in range(n_copies):             # repeat family
        parts.append(unit)
        parts.append(rng.choice(bases4, size=101).astype(np.uint8))
    g0 = np.concatenate(parts)
    g = Genome(chroms=[g0], scaffolds=[
        Scaffold(chrom=1, sid=1, start=0, length=len(g0),
                 name="s")]).finalize()
    idx = build_index(g, 10)
    analyze_index(idx, 0.0)   # no quantile exclusion; cap = MAX_SITES_CAP
    return idx, g0, unit


def _votes_for(idx, read, L):
    cfg = qd.make_config(idx, L)
    starts_d, sites_d, gpack_d, nmask_d, _ = qd.device_arrays(idx)
    fn = jax.jit(lambda b: qd.candidate_stage(cfg, b, starts_d,
                                              sites_d)[1]["votes"])
    return np.asarray(fn(read[None, :]))[0]


def test_readmission_recovers_repeat_spanning_read():
    """A read half in unique sequence, half in a 40-copy repeat: the
    repeat keys' lists (len 40 > cap 32) are excluded at tier 0 but
    re-admitted at tier 2x when the read hits too few keys."""
    rng = np.random.default_rng(2)
    idx, g0, unit = _mk_index(rng, 40)
    L = 60
    # read spanning the unique/repeat boundary at the FIRST repeat copy
    start = 3000 - 20
    read = g0[start:start + L].copy()
    votes = _votes_for(idx, read, L)
    cfg = qd.make_config(idx, L)
    nk = len(cfg.offsets_list)
    # sanity: the repeat lists really are over the base cap
    lengths = np.diff(idx.starts)
    assert lengths.max() >= 40 > cfg.S
    # with re-admission the winning chain includes repeat-key sites, so
    # votes exceed what the unique flank alone (<4 keys) could give
    assert votes[0] >= 4, votes


def test_no_readmission_when_zero_hits():
    """Fully-repetitive reads (numHits==0 at tier 0) do NOT re-admit
    (reference: find:421 'if(numHits>0)') — they stay unseeded."""
    rng = np.random.default_rng(3)
    idx, g0, unit = _mk_index(rng, 40)
    L = 60
    # read fully inside the repeat unit: every key's list has ~40 sites
    pos = 3000  # first repeat copy start
    read = g0[pos:pos + L].copy()
    votes = _votes_for(idx, read, L)
    assert votes[0] == 0, votes
