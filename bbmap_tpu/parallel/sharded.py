"""Multi-chip execution: mesh construction and sharded alignment steps.

TPU-native replacement for the reference's (stubbed) MPI distributed
stream layer (reference: stream/ConcurrentReadInputStreamD.java:17,
align2/Shared.java:33-38; SURVEY.md §2.11 P5/§5.8). Instead of
master-broadcast read batches over MPI ranks, read batches are sharded
across a ``jax.sharding.Mesh``:

- axis "data": batch data parallelism — each chip scores its shard of the
  candidate batch (reference mechanism P1: thread data parallelism)
- axis "index": genome/index block sharding — each shard scores reads
  against its genome block and the best site is combined with a max
  collective (reference mechanism P4: CHROMS_PER_BLOCK index blocks,
  align2/BBIndex.java:616-642)

Stats merge with psum (the reference's end-of-run histogram merge,
align2/ReadStats.java:208-256, becomes a collective).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import msa_jax


def make_mesh(n_data: Optional[int] = None,
              n_index: int = 1) -> Mesh:
    """Build a (data, index) mesh over the available devices."""
    devs = np.array(jax.devices())
    if n_data is None:
        n_data = len(devs) // n_index
    devs = devs[: n_data * n_index].reshape(n_data, n_index)
    return Mesh(devs, axis_names=("data", "index"))


def sharded_score_step(mesh: Mesh, R: int, C: int):
    """Jitted, mesh-sharded candidate-scoring step.

    Inputs: reads (B, R) uint8, refs (B, 2, C) uint8 — two index-shard
    windows per read (stand-in for per-genome-block candidates); the
    "index" axis shards the window dimension. Returns per-read best
    (score, shard) plus a globally reduced mapped count — the all-gather /
    all-reduce of per-shard best scores described in SURVEY.md §5.8.
    """
    data_sharding = NamedSharding(mesh, P("data", None))
    refs_sharding = NamedSharding(mesh, P("data", "index", None))
    out_sharding = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    def step(reads, refs, min_score):
        # score each read against each index shard's window
        def per_shard(refs_s):
            s, _c, _st = jax.vmap(
                lambda rd, rf: msa_jax.msa_score_single(rd, rf, R, C))(
                    reads, refs_s)
            return s
        scores = jax.vmap(per_shard, in_axes=1, out_axes=1)(refs)  # (B, S)
        best = jnp.max(scores, axis=1)
        best_shard = jnp.argmax(scores, axis=1)
        n_mapped = jnp.sum((best >= min_score).astype(jnp.int32))
        return best, best_shard, n_mapped

    return jax.jit(
        step,
        in_shardings=(data_sharding, refs_sharding, None),
        out_shardings=(out_sharding, out_sharding, repl))


def shard_batch(mesh: Mesh, arr: np.ndarray, spec: P) -> jax.Array:
    return jax.device_put(arr, NamedSharding(mesh, spec))


# ---------------------------------------------------------------------------
# Real sharded pipeline (VERDICT r1 next-step #2): the CSR k-mer index —
# the dominant HBM tenant at ~5 bytes/genome-base vs 0.25 for the packed
# genome — is partitioned into contiguous genome blocks over the mesh's
# "index" axis (reference P4: per-block sub-indexes,
# align2/BBIndex.java:616-642, IndexMaker4 CHROMS_PER_BLOCK). Each shard
# runs the quickmap candidate stage (seed->chain->vote->top-K) against
# its block; candidates all-gather over "index" and merge with the exact
# single-device selection order; gapless scoring + match generation run
# on the merged top-K against the replicated packed genome. Reads are
# data-parallel over the "data" axis (reference P1/P5).
# ---------------------------------------------------------------------------

from dataclasses import dataclass

from ..align import quickmap_device as qd
from ..index.build import KmerIndex


@dataclass
class ShardedIndex:
    """CSR index partitioned into contiguous genome blocks. Sites keep
    GLOBAL flat positions, so merged candidates need no coordinate
    translation."""
    n_shards: int
    bounds: np.ndarray      # (n_shards + 1,) block boundaries (flat)
    starts_s: np.ndarray    # (n_shards, 4^k + 1) int32 per-block CSR
    sites_s: np.ndarray     # (n_shards, width) int32, padded


def shard_index(index: KmerIndex, n_shards: int,
                bounds: Optional[np.ndarray] = None) -> ShardedIndex:
    """Partition the CSR index at genome-block boundaries. Default
    bounds: equal flat splits snapped to scaffold starts when one lies
    within 25% of the block size (the reference packs whole chromosomes
    per block; chains never straddle blocks there — snapping preserves
    that property for multi-scaffold genomes)."""
    G = len(index.genome_codes)
    if bounds is None:
        from ..index.build import shard_bounds
        bounds = shard_bounds(G, index.chrom_offsets, n_shards)
    bounds = np.asarray(bounds, np.int64)
    assert len(bounds) == n_shards + 1
    n_keys = index.n_keys
    lengths = np.diff(index.starts)
    key_of_site = np.repeat(np.arange(n_keys, dtype=np.int64), lengths)
    block_of_site = np.clip(
        np.searchsorted(bounds, index.sites, side="right") - 1,
        0, n_shards - 1)
    starts_list = []
    sites_list = []
    for b in range(n_shards):
        sel = block_of_site == b
        counts_b = np.bincount(key_of_site[sel], minlength=n_keys)
        st = np.zeros(n_keys + 1, np.int64)
        np.cumsum(counts_b, out=st[1:])
        starts_list.append(st.astype(np.int32))
        # selection preserves order, and global per-key lists are in
        # ascending position order, so per-block lists stay sorted
        sites_list.append(index.sites[sel])
    width = max(1, max(len(s) for s in sites_list))
    sites_s = np.zeros((n_shards, width), np.int32)
    for b, s in enumerate(sites_list):
        sites_s[b, :len(s)] = s
    return ShardedIndex(n_shards=n_shards, bounds=bounds,
                        starts_s=np.stack(starts_list), sites_s=sites_s)


def _global_counts(index: KmerIndex) -> np.ndarray:
    """Per-key GLOBAL site-list length, uint8 saturated at 255 (every
    admission threshold — 5x tier cap and the slot budget — is < 255).
    Replicated to every shard so over-long-list exclusion, staged
    re-admission, and the greedy slot budget reproduce the
    single-device decisions bit for bit (reference:
    BBIndex.find:421-440 consults whole-index list lengths)."""
    return np.minimum(np.diff(index.starts), 255).astype(np.uint8)


def _merge_candidates(cand, K: int):
    """Merge per-shard candidate tables (B, n_shards*K arrays) down to
    the global top-K with EXACTLY the single-device selection order:
    votes desc, then strand asc, then chain-start diagonal asc (the
    single-device top_k's slot order — strand-major, diagonals sorted
    ascending within strand)."""
    votes = cand["votes"]
    # two stable argsorts emulate the lexicographic key without int64:
    # sort by start asc, then stably by (budget-votes)*2+strand asc
    ord1 = jnp.argsort(cand["start"], axis=1, stable=True)
    take1 = lambda a: jnp.take_along_axis(a, ord1, axis=1)
    v1 = take1(votes)
    s1 = take1(cand["strand"])
    key1 = (jnp.int32(1 << 20) - v1) * 2 + s1
    ord2 = jnp.argsort(key1, axis=1, stable=True)[:, :K]
    final = jnp.take_along_axis(ord1, ord2, axis=1)
    take = lambda a: jnp.take_along_axis(a, final, axis=1)
    return {k: take(v) for k, v in cand.items()}


def build_sharded_quickmap(mesh: Mesh, index: KmerIndex,
                           sindex: ShardedIndex, L: int,
                           chain_dist: int = 400,
                           min_ratio: float = 0.56,
                           max_list_length: Optional[int] = None):
    """Mesh-sharded quickmap over the REAL pipeline candidate/finalize
    stages. Returns run(bases (B, L) uint8) -> QuickmapRun with B
    divisible by the mesh "data" axis size. Output semantics match
    build_quickmap exactly when chains do not straddle block bounds
    (guaranteed for scaffold-aligned bounds)."""
    from jax.experimental.shard_map import shard_map

    cfg = qd.make_config(index, L, chain_dist, min_ratio,
                         max_list_length)
    # _global_counts saturates at uint8 255: every admission threshold
    # must stay below that or sharded-vs-single parity silently breaks
    # (ADVICE r2) — assert the invariant at build time.
    assert 5 * cfg.S < 255 and qd.SLOT_BUDGET < 255, \
        (cfg.S, qd.SLOT_BUDGET)
    K = qd.MAX_CANDIDATES
    gcnt = _global_counts(index)
    gpack_np, nmask_np = qd.pack_genome_2bit(index.genome_codes)

    repl = NamedSharding(mesh, P())
    gcnt_d = jax.device_put(gcnt, repl)
    # reference retention consults the CANONICAL counts table, which is
    # global by construction — replicate it; shard parity is automatic
    ccnt_np = index.counts_canonical if cfg.ref_admit else None
    if ccnt_np is None:
        # dummy (unused when ref_admit is off) — keeps the shard_map
        # arity/spec static
        ccnt_np = np.zeros(1, np.int32)
    ccnt_d = jax.device_put(ccnt_np.astype(np.int32), repl)
    gpack_d = jax.device_put(gpack_np, repl)
    nmask_d = jax.device_put(nmask_np, repl)
    starts_d = jax.device_put(sindex.starts_s,
                              NamedSharding(mesh, P("index", None)))
    sites_d = jax.device_put(sindex.sites_s,
                             NamedSharding(mesh, P("index", None)))

    def worker(bases, starts_s, sites_s, gcnt, gpack, nmask, ccnt):
        # local shapes: starts_s (1, 4^k+1), sites_s (1, width)
        rcodes, cand = qd.candidate_stage(
            cfg, bases, starts_s[0], sites_s[0], gcnt, ccnt_d=ccnt)
        # all-gather candidate tables over the index axis -> (B, n*K)
        gathered = {
            k: jax.lax.all_gather(v, "index", axis=1, tiled=True)
            for k, v in cand.items()}
        merged = _merge_candidates(gathered, K)
        return qd.finalize_stage(cfg, rcodes, merged, gpack, nmask)

    sm = shard_map(
        worker, mesh=mesh,
        in_specs=(P("data", None), P("index", None), P("index", None),
                  P(), P(), P(), P()),
        out_specs=(P("data", None), P("data", None)),
        check_rep=False)
    jitted = jax.jit(sm)

    def run(bases) -> qd.QuickmapRun:
        bases_d = jax.device_put(
            np.ascontiguousarray(bases),
            NamedSharding(mesh, P("data", None)))
        out_i32, out_match = jitted(bases_d, starts_d, sites_d,
                                    gcnt_d, gpack_d, nmask_d, ccnt_d)
        return qd.QuickmapRun(out_i32, out_match, L)

    return run
