"""Gapless (no-indel) scoring and match generation, vectorized over a batch.

Clone of the reference's scoreNoIndels / genMatchNoIndels semantics
(reference: align2/MultiStateAligner11ts.java:1885-1975): run-length
streak scoring where N positions contribute 0 points and do NOT interrupt
the match/sub streak (mode and timeInMode persist across N runs).

This is the reference's main DP-avoidance path: a site whose gapless score
is >= maxImperfectScore cannot be beaten by any indel alignment, so the
full DP is skipped (reference: align2/AbstractMapThread.java:1252).
Vectorized here as run-length encoding over the N-filtered positions —
one pass of numpy ops for an entire candidate batch.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..core.constants import (POINTS_MATCH, POINTS_MATCH2, POINTS_NOCALL,
                              POINTS_NOREF, POINTS_SUB, POINTS_SUB2,
                              POINTS_SUB3, POINTS_SUB_ARRAY)

_N = ord("N")


def score_no_indels_flat(reads: np.ndarray, lengths: np.ndarray,
                         genome: np.ndarray,
                         ref_starts: np.ndarray,
                         prof=None) -> np.ndarray:
    """Score J gapless alignments.

    reads: (J, Lmax) ASCII; lengths: (J,); genome: flat ASCII genome;
    ref_starts: (J,) flat genome position aligned to read base 0.
    Returns int32 scores. Positions outside the genome score POINTS_NOREF
    (reference: :1902-1913)."""
    PM, PM2, PSUB, PSUB2, PSUB3, LIM3 = (
        (POINTS_MATCH, POINTS_MATCH2, POINTS_SUB, POINTS_SUB2,
         POINTS_SUB3, 5) if prof is None else
        (prof.POINTS_MATCH, prof.POINTS_MATCH2, prof.POINTS_SUB,
         prof.POINTS_SUB2, prof.POINTS_SUB3, prof.LIMIT_FOR_COST_3))
    J, Lmax = reads.shape
    G = len(genome)
    pos = ref_starts[:, None] + np.arange(Lmax)[None, :]
    inb = (pos >= 0) & (pos < G)
    refs = np.full((J, Lmax), _N, np.uint8)
    refs[inb] = genome[pos[inb].astype(np.int64)]
    valid = np.arange(Lmax)[None, :] < lengths[:, None]

    c = reads
    r = refs
    is_match = (c == r) & (c != _N) & valid & inb
    is_nocall = (c == _N) & valid
    is_noref = (~is_match) & (~is_nocall) & (r == _N) & valid & inb
    out_of_bounds = valid & ~inb
    is_skip = is_nocall | is_noref | out_of_bounds
    is_sub = valid & ~is_match & ~is_skip

    # run-length scoring over the N-filtered subsequence of each row
    flat_keep = (valid & ~is_skip)
    kind = np.where(is_match, 0, 1)  # only meaningful where flat_keep

    rows, cols = np.nonzero(flat_keep)
    if len(rows) == 0:
        return np.zeros(J, np.int32)
    kinds = kind[rows, cols]
    # run boundaries: row change or kind change
    newrun = np.ones(len(rows), bool)
    newrun[1:] = (rows[1:] != rows[:-1]) | (kinds[1:] != kinds[:-1])
    run_id = np.cumsum(newrun) - 1
    run_start = np.zeros(run_id[-1] + 1, np.int64)
    run_start[run_id[newrun]] = np.nonzero(newrun)[0]
    pos_in_run = np.arange(len(rows)) - run_start[run_id]

    sub_i = pos_in_run + 1
    sub_pts = np.where(sub_i > LIM3, PSUB3,
                       np.where(sub_i > 1, PSUB2, PSUB))
    pts = np.where(kinds == 0,
                   np.where(pos_in_run == 0, PM, PM2), sub_pts)
    scores = np.zeros(J, np.int64)
    np.add.at(scores, rows, pts)
    # NOCALL/NOREF points are 0 with default constants; kept for clarity
    if POINTS_NOCALL:
        scores += POINTS_NOCALL * is_nocall.sum(1)
    if POINTS_NOREF:
        scores += POINTS_NOREF * (is_noref.sum(1) + out_of_bounds.sum(1))
    return scores.astype(np.int32)


def gen_match_no_indels(read: np.ndarray, genome: np.ndarray,
                        ref_start: int) -> bytes:
    """reference: align2/MultiStateAligner11ts.genMatchNoIndels:1956-1972.
    m/S/N per position; out-of-genome ref counts as N."""
    L = len(read)
    pos = ref_start + np.arange(L)
    inb = (pos >= 0) & (pos < len(genome))
    r = np.full(L, _N, np.uint8)
    r[inb] = genome[pos[inb]]
    out = np.where((read == _N) | (r == _N), ord("N"),
                   np.where(read == r, ord("m"), ord("S"))).astype(np.uint8)
    return bytes(out)


# ---------------------------------------------------------------------------
# Device (JAX) gapless scorer — exact same semantics as
# score_no_indels_flat, as a lax.scan over read positions with all
# candidates in the vector lanes. One device call scores every candidate
# of a batch group.
# ---------------------------------------------------------------------------

import functools as _functools

import jax as _jax
import jax.numpy as _jnp

from ..core.constants import (LIMIT_FOR_COST_3 as _LIM3,
                              POINTS_MATCH as _PM, POINTS_MATCH2 as _PM2,
                              POINTS_SUB as _PS, POINTS_SUB2 as _PS2,
                              POINTS_SUB3 as _PS3)

_MODE_NONE, _MODE_MS, _MODE_SUB = 0, 1, 2


@_functools.partial(_jax.jit, static_argnums=(2, 3))
def score_no_indels_jax(reads, refs, L: int, prof=None):
    """reads, refs: (J, L) uint8 ASCII (refs pre-gathered at each
    candidate's diagonal, out-of-genome positions as 'N').
    Returns (J,) int32 scores. Reference: scoreNoIndels :1885-1952."""
    J = reads.shape[0]
    PM, PM2, PS, PS2, PS3, LIM3 = (
        (_PM, _PM2, _PS, _PS2, _PS3, _LIM3) if prof is None else
        (prof.POINTS_MATCH, prof.POINTS_MATCH2, prof.POINTS_SUB,
         prof.POINTS_SUB2, prof.POINTS_SUB3, prof.LIMIT_FOR_COST_3))

    def step(carry, cr):
        score, mode, t = carry
        c, r = cr
        is_match = (c == r) & (c != _N)
        is_nocall = (c == _N)
        is_noref = (~is_match) & (~is_nocall) & (r == _N)
        is_sub = (~is_match) & (~is_nocall) & (~is_noref)

        m_pts = _jnp.where(mode == _MODE_MS, PM2, PM)
        new_t_m = _jnp.where(mode == _MODE_MS, t + 1, 0)
        s_t = _jnp.where(mode == _MODE_SUB, t + 1, 0)
        s_pts = _jnp.where(s_t + 1 > LIM3, PS3,
                           _jnp.where(s_t + 1 > 1, PS2, PS))

        score = score + _jnp.where(is_match, m_pts,
                                   _jnp.where(is_sub, s_pts, 0))
        new_mode = _jnp.where(is_match, _MODE_MS,
                              _jnp.where(is_sub, _MODE_SUB, mode))
        new_time = _jnp.where(is_match, new_t_m,
                              _jnp.where(is_sub, s_t, t))
        return (score, new_mode, new_time), None

    init = (_jnp.zeros(J, _jnp.int32), _jnp.full(J, _MODE_NONE, _jnp.int32),
            _jnp.zeros(J, _jnp.int32))
    xs = (reads.T.astype(_jnp.int32), refs.T.astype(_jnp.int32))
    (score, _, _), _ = _jax.lax.scan(step, init, xs)
    return score


def _shift_right(x, fill):
    pad = _jnp.full(x.shape[:-1] + (1,), fill, x.dtype)
    return _jnp.concatenate([pad, x[..., :-1]], axis=-1)


def score_match_sub_vec(is_match, is_sub, prof=None):
    """Closed-form gapless streak scoring — no sequential scan.

    Same semantics as score_no_indels_jax (reference:
    align2/MultiStateAligner11ts.scoreNoIndels:1885-1952): skip positions
    (nocall/noref, i.e. neither is_match nor is_sub) are transparent to
    the match/sub run state. Derivation: runs over the non-skip
    subsequence are recovered with cummax of last-match/last-sub indices;
    the i-th base of a match run scores POINTS_MATCH2 (first scores
    POINTS_MATCH); the i-th base of a sub run scores by the streak table.
    All ops are vectorized cumsum/cummax along the read axis, which XLA
    lowers to log-depth passes instead of an L-step scan.

    is_match/is_sub: bool (..., L), mutually exclusive.
    Returns int32 scores (...,).
    """
    PM, PM2, PS, PS2, PS3, LIM3 = (
        (POINTS_MATCH, POINTS_MATCH2, POINTS_SUB, POINTS_SUB2,
         POINTS_SUB3, _LIM3) if prof is None else
        (prof.POINTS_MATCH, prof.POINTS_MATCH2, prof.POINTS_SUB,
         prof.POINTS_SUB2, prof.POINTS_SUB3, prof.LIMIT_FOR_COST_3))
    L = is_match.shape[-1]
    l = _jnp.arange(L, dtype=_jnp.int32)
    lm = _jnp.where(is_match, l, -1)
    ls = _jnp.where(is_sub, l, -1)
    ax = lm.ndim - 1
    cm = _jax.lax.cummax(lm, axis=ax)
    cs = _jax.lax.cummax(ls, axis=ax)
    pm = _shift_right(cm, _jnp.int32(-1))   # last match idx before here
    ps = _shift_right(cs, _jnp.int32(-1))   # last sub idx before here
    prev_is_match = pm > ps
    prev_is_sub = ps > pm
    m_start = is_match & ~prev_is_match
    s_start = is_sub & ~prev_is_sub
    ns = is_match | is_sub
    r = _jnp.cumsum(ns.astype(_jnp.int32), axis=-1)   # 1-based nonskip rank
    rstart = _jax.lax.cummax(_jnp.where(s_start, r, 0), axis=ax)
    p = r - rstart + 1                                # position in sub run
    sub_pts = _jnp.where(p <= 1, PS, _jnp.where(p <= LIM3, PS2, PS3))
    pts = _jnp.where(
        is_match,
        _jnp.where(m_start, PM, PM2),
        _jnp.where(is_sub, sub_pts, 0)).astype(_jnp.int32)
    return _jnp.sum(pts, axis=-1, dtype=_jnp.int32)


def gather_ref_rows(genome: np.ndarray, ref_starts: np.ndarray,
                    L: int) -> np.ndarray:
    """(J,) flat starts -> (J, L) ASCII ref rows, 'N' outside."""
    J = len(ref_starts)
    G = len(genome)
    starts = np.asarray(ref_starts, np.int64)
    # fast path: all rows fully inside the genome (the common case —
    # avoids the 2x boolean masks and masked fancy assignment)
    if J and starts.min() >= 0 and starts.max() + L <= G:
        pos = (starts[:, None] + np.arange(L, dtype=np.int64)[None, :])
        return genome[pos]
    pos = starts[:, None] + np.arange(L)[None, :]
    inb = (pos >= 0) & (pos < G)
    out = np.full((J, L), _N, np.uint8)
    out[inb] = genome[pos[inb]]
    return out


def gen_match_no_indels_batch(reads: np.ndarray,
                              refs: np.ndarray) -> np.ndarray:
    """(J, L) reads/refs -> (J, L) match symbols (m/S/N), vectorized
    (reference: genMatchNoIndels:1956-1972)."""
    return np.where((reads == _N) | (refs == _N), ord("N"),
                    np.where(reads == refs, ord("m"),
                             ord("S"))).astype(np.uint8)
