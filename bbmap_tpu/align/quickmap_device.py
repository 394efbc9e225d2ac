"""Device quickmap: seeding -> chaining -> gapless scoring -> selection as
ONE jitted XLA program.

TPU-native replacement for the whole per-read search loop of the
reference (reference: align2/AbstractMapThread.quickMap:643 +
align2/BBIndex.find:403/slowWalk2:855): the CSR index (starts/sites) and
packed genome live in HBM; a batch of reads flows through

1. key extraction at spaced offsets (2-bit packing, both strands)
2. bounded site-list gather from the CSR arrays (lists capped at
   MAX_SITES_PER_KEY; longer lists are skipped like the reference's
   over-long list exclusion, BBIndex.find:421-440)
3. diagonal sort + chain segmentation (replaces the Quad heap merge)
4. per-chain vote counts, spread, and modal diagonal via segment ops
5. top-K candidate selection per read
6. gapless streak scoring of every candidate at its modal diagonal
7. per-read best/second selection with clearzone ambiguity

The host receives one fixed-shape result bundle per batch; only DP
escalation (indels) and SAM formatting remain host-side.

Deviations from the host path (documented): votes = chain hit count
(not distinct-offset count), modal diagonal from the longest equal-diag
run (ties -> lowest diagonal).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import constants as K
from ..core.bases import BASE_TO_NUMBER
from ..index.build import KmerIndex
from . import seed as seed_host
from .gapless import score_no_indels_jax

MAX_SITES_PER_KEY = 8
MAX_CANDIDATES = 8
I32 = jnp.int32
BIG = np.int32(2 ** 30)

_B2N = np.full(256, -1, np.int8)
_B2N[:] = BASE_TO_NUMBER


class QuickmapResult(NamedTuple):
    best_score: jnp.ndarray    # (B,) int32 gapless score of best site
    best_diag: jnp.ndarray     # (B,) int32 flat genome pos of read base 0
    best_strand: jnp.ndarray   # (B,) int32
    best_start: jnp.ndarray    # (B,) int32 chain min-diagonal
    best_spread: jnp.ndarray   # (B,) int32 chain diagonal spread
    second_score: jnp.ndarray  # (B,) int32
    n_good: jnp.ndarray        # (B,) int32 candidates above cutoff
    cand_scores: jnp.ndarray   # (B, MAX_CANDIDATES) int32 (debug/DP)
    cand_diag: jnp.ndarray     # (B, MAX_CANDIDATES) int32
    cand_strand: jnp.ndarray   # (B, MAX_CANDIDATES) int32
    cand_start: jnp.ndarray    # (B, MAX_CANDIDATES) int32
    cand_spread: jnp.ndarray   # (B, MAX_CANDIDATES) int32


def _keys_from_ascii(bases, offsets, k):
    """(B, L) ASCII -> (B, nk) int32 keys, -1 invalid."""
    table = jnp.asarray(_B2N, jnp.int32)
    codes = table[bases.astype(jnp.int32)]
    nk = offsets.shape[0]
    keys = jnp.zeros(bases.shape[:1] + (nk,), jnp.int32)
    bad = jnp.zeros_like(keys, dtype=bool)
    for j in range(k):
        c = codes[:, offsets + j]
        bad |= c < 0
        keys = (keys << 2) | jnp.where(c < 0, 0, c)
    return jnp.where(bad, -1, keys)


def _rc_keys(keys, k):
    x = (~keys).astype(jnp.uint32)
    x = ((x & 0x33333333) << 2) | ((x >> 2) & 0x33333333)
    x = ((x & 0x0F0F0F0F) << 4) | ((x >> 4) & 0x0F0F0F0F)
    x = ((x & 0x00FF00FF) << 8) | ((x >> 8) & 0x00FF00FF)
    x = ((x & 0x0000FFFF) << 16) | (x >> 16)
    x = x >> (32 - 2 * k)
    return x.astype(jnp.int32)


def build_quickmap(index: KmerIndex, L: int, chain_dist: int = 400,
                   min_ratio: float = 0.56,
                   max_list_length: Optional[int] = None):
    """Returns a jitted quickmap(bases_ascii (B, L) uint8) -> QuickmapResult.
    Device-resident constants (CSR index + genome) are closed over."""
    k = index.k
    offsets_np = seed_host.make_offsets(L, k)
    if offsets_np is None:
        raise ValueError(f"read length {L} < k {k}")
    nk = len(offsets_np)
    if max_list_length is None:
        max_list_length = min(index.max_usable_length, MAX_SITES_PER_KEY)
    max_list_length = min(max_list_length, MAX_SITES_PER_KEY)

    starts_d = jax.device_put(index.starts.astype(np.int32))
    sites_d = jax.device_put(index.sites.astype(np.int32))
    from ..core.bases import codes_to_ascii
    genome_ascii = codes_to_ascii(index.genome_codes)
    genome_d = jax.device_put(genome_ascii)
    G = len(genome_ascii)
    offsets_d = jnp.asarray(offsets_np.astype(np.int32))
    offadj_minus = jnp.asarray((L - (offsets_np + k)).astype(np.int32))
    n_slots = 2 * nk * MAX_SITES_PER_KEY
    max_sw = K.max_quality(L)
    min_score = int(max_sw * min_ratio)

    INVALID = jnp.int32(2 ** 30)

    def quickmap(bases, starts_d, sites_d, genome_d):
        B = bases.shape[0]
        kp = _keys_from_ascii(bases, offsets_d, k)          # (B, nk)
        km = jnp.where(kp < 0, -1, _rc_keys(jnp.where(kp < 0, 0, kp), k))
        keys = jnp.stack([kp, km], axis=1)                  # (B, 2, nk)
        offadj = jnp.stack([
            jnp.broadcast_to(offsets_d, (B, nk)),
            jnp.broadcast_to(offadj_minus, (B, nk))], axis=1)
        valid = keys >= 0
        safe = jnp.where(valid, keys, 0)
        s0 = starts_d[safe]
        cnt = starts_d[safe + 1] - s0
        cnt = jnp.where(valid & (cnt <= max_list_length), cnt, 0)
        # bounded gather: (B, 2, nk, S)
        sl = jnp.arange(MAX_SITES_PER_KEY, dtype=I32)
        gather_idx = s0[..., None] + sl
        gather_idx = jnp.clip(gather_idx, 0, sites_d.shape[0] - 1)
        site = sites_d[gather_idx]
        have = sl[None, None, None, :] < cnt[..., None]
        diag = jnp.where(have, site - offadj[..., None],
                         INVALID)
        # sort diagonals within each (read, strand)
        flat = diag.reshape(B * 2, nk * MAX_SITES_PER_KEY)
        flat = jnp.sort(flat, axis=1)
        valid_f = flat < INVALID

        # chain segmentation — scatter-free: all per-chain statistics are
        # carried by each chain's FIRST element via prefix scans + gathers
        # (segment_sum/min/max lower to scatters on TPU; cumsum/cummax do
        # not)
        W = nk * MAX_SITES_PER_KEY
        nseg = W
        R2 = B * 2
        dd = jnp.diff(flat, axis=1)
        new_chain = jnp.concatenate(
            [jnp.ones((R2, 1), bool), dd > chain_dist], axis=1)
        new_chain &= valid_f
        idx = jax.lax.broadcasted_iota(I32, (R2, W), 1)
        # boundary = start of the NEXT chain (or first invalid slot)
        boundary = new_chain | ~valid_f
        # next boundary strictly after e: reverse cummin of boundary idx
        bidx = jnp.where(boundary, idx, W)
        nxt = jnp.flip(jax.lax.cummin(jnp.flip(bidx, 1), axis=1), 1)
        next_start = jnp.concatenate(
            [nxt[:, 1:], jnp.full((R2, 1), W, I32)], axis=1)
        size = jnp.where(new_chain, next_start - idx, 0)
        last_idx = jnp.clip(next_start - 1, 0, W - 1)
        smin = flat                                  # first elem = chain min
        smax = jnp.take_along_axis(flat, last_idx, axis=1)

        # modal diagonal: longest equal-diag run in the chain; ties ->
        # lowest diag. Encode (run_size, earliness) per run-first element
        # and take the chain max via an ordinal-offset cummax.
        dd_eq = jnp.concatenate(
            [jnp.ones((R2, 1), bool), dd != 0], axis=1)
        new_run = (dd_eq | new_chain) & valid_f
        ridx = jnp.where(new_run | ~valid_f, idx, W)
        rnxt = jnp.flip(jax.lax.cummin(jnp.flip(ridx, 1), axis=1), 1)
        rnext = jnp.concatenate(
            [rnxt[:, 1:], jnp.full((R2, 1), W, I32)], axis=1)
        run_size = jnp.where(new_run, rnext - idx, 0)
        seg_start = jax.lax.cummax(
            jnp.where(new_chain, idx, -1), axis=1)
        in_chain_off = jnp.clip(idx - seg_start, 0, 255)
        meta = (jnp.clip(run_size, 0, 255) << 8) | (255 - in_chain_off)
        seg_ord = jnp.cumsum(new_chain.astype(I32), axis=1)  # 1..W
        glob = (seg_ord << 16) | jnp.where(new_run, meta, 0)
        gmax = jax.lax.cummax(glob, axis=1)
        # winner meta at the chain's last element
        win = jnp.take_along_axis(gmax, last_idx, axis=1)
        win_off = 255 - (win & 0xFF)
        mode_idx = jnp.clip(seg_start + win_off, 0, W - 1)
        mode = jnp.take_along_axis(flat, mode_idx, axis=1)

        # candidate table per read: (B, 2*W); non-first elements have 0
        # votes and never reach the top-k
        votes = size.reshape(B, 2 * nseg)
        c_start = smin.reshape(B, 2 * nseg)
        c_stop = smax.reshape(B, 2 * nseg)
        c_mode = mode.reshape(B, 2 * nseg)
        c_strand = jnp.concatenate(
            [jnp.zeros((B, nseg), I32), jnp.ones((B, nseg), I32)], axis=1)

        topv, topi = jax.lax.top_k(votes, MAX_CANDIDATES)
        gi = topi
        take = lambda a: jnp.take_along_axis(a, gi, axis=1)
        cd_start = take(c_start)
        cd_stop = take(c_stop)
        cd_mode = take(c_mode)
        cd_strand = jnp.take_along_axis(c_strand, gi, axis=1)
        cd_votes = topv
        cd_valid = cd_votes > 0
        cd_spread = jnp.where(cd_valid,
                              (cd_stop - cd_start).astype(I32), 0)

        # gapless scoring at modal diagonal
        pos = jnp.clip(cd_mode[..., None] + jnp.arange(L), 0, G - 1)
        inb = (cd_mode[..., None] + jnp.arange(L) >= 0) & \
              (cd_mode[..., None] + jnp.arange(L) < G)
        refs = jnp.where(inb, genome_d[pos], ord("N")).astype(jnp.uint8)
        # strand-adjusted reads
        comp = jnp.asarray(_COMP_TABLE)
        rc = comp[bases.astype(jnp.int32)][:, ::-1].astype(jnp.uint8)
        cand_reads = jnp.where((cd_strand == 0)[..., None],
                               bases[:, None, :], rc[:, None, :])
        scores = score_no_indels_jax(
            cand_reads.reshape(B * MAX_CANDIDATES, L),
            refs.reshape(B * MAX_CANDIDATES, L), L
        ).reshape(B, MAX_CANDIDATES)
        scores = jnp.where(cd_valid, scores, -(2 ** 30))

        # per-read best/second (deterministic: score desc, then slot order,
        # slots already sorted by votes desc then segment order)
        order = jnp.argsort(-scores, axis=1, stable=True)
        o0 = order[:, 0:1]
        o1 = order[:, 1:2]
        g1 = lambda a, o: jnp.take_along_axis(a, o, axis=1)[:, 0]
        best_score = g1(scores, o0)
        second_score = g1(scores, o1)
        n_good = jnp.sum(scores >= min_score, axis=1).astype(I32)
        return QuickmapResult(
            best_score=best_score.astype(I32),
            best_diag=g1(cd_mode, o0),
            best_strand=g1(cd_strand, o0),
            best_start=g1(cd_start, o0),
            best_spread=g1(cd_spread, o0).astype(I32),
            second_score=second_score.astype(I32),
            n_good=n_good,
            cand_scores=scores.astype(I32),
            cand_diag=cd_mode,
            cand_strand=cd_strand,
            cand_start=cd_start,
            cand_spread=cd_spread.astype(I32),
        )

    jitted = jax.jit(quickmap)

    def run(bases):
        return jitted(bases, starts_d, sites_d, genome_d)

    return run


_COMP_TABLE = np.arange(256, dtype=np.uint8)
for _a, _b in [("A", "T"), ("C", "G"), ("G", "C"), ("T", "A")]:
    _COMP_TABLE[ord(_a)] = ord(_b)
