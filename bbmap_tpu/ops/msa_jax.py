"""TPU wavefront implementation of the multi-state banded affine DP.

Same scoring semantics as the NumPy oracle (ops/msa_ref.py; reference:
align2/MultiStateAligner11ts.java:623-866) but reformulated for the TPU
vector unit: the DP is swept along anti-diagonals, so every cell on a wave
depends only on the two previous waves and the whole wave is one vector op.
The per-cell packed int32 ``score << 11 | streak`` encoding is preserved
exactly, so scores are bit-identical to the reference.

Layout: wave ``d`` holds cells (r, c=d-r) for r in [0, R], kept as three
int32 vectors indexed by r. Dependencies:

  MS(r, c)  <- wave d-2, r-1   (diagonal)
  DEL(r, c) <- wave d-1, r     (left)
  INS(r, c) <- wave d-1, r-1   (up)

Boundary: row 0 is score 0 (free ref start); col 0 (r == d) carries the
cumulative insertion penalty (reference ctor :84-112).

`msa_score` is the fillLimited/fillUnlimited analog (score + argmax col +
state, no traceback storage). `msa_full` additionally emits every wave so
the host (or a JAX walk) can run traceback2 semantics.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.constants import (
    BADoff, BARRIER_D1, BARRIER_I1, GAPC, LIMIT_FOR_COST_3, LIMIT_FOR_COST_4,
    LIMIT_FOR_COST_5, MASK5, MAX_TIME, MODE_DEL, MODE_INS, MODE_MS,
    POINTSoff_DEL, POINTSoff_DEL2, POINTSoff_DEL3, POINTSoff_DEL4,
    POINTSoff_DEL5, POINTSoff_DEL_REF_N, POINTSoff_GAP, POINTSoff_INS,
    POINTSoff_INS2, POINTSoff_INS3, POINTSoff_INS4, POINTSoff_INS_ARRAY,
    POINTSoff_MATCH, POINTSoff_MATCH2, POINTSoff_NOCALL, POINTSoff_SUB,
    POINTSoff_SUB2, POINTSoff_SUB3, POINTSoff_SUBR, SCOREOFFSET, TIMEMASK,
)

_N = ord("N")
I32 = jnp.int32
_SCOREMASK_I32 = jnp.int32(~TIMEMASK)  # clears low TIMEBITS, keeps sign


def _score(p):
    return jnp.bitwise_and(p, _SCOREMASK_I32)


def _time(p):
    return jnp.bitwise_and(p, jnp.int32(TIMEMASK))


def _clamp_time(t):
    return jnp.where(t > MAX_TIME, MAX_TIME - MASK5, t)


def _sub_array(i):
    """POINTSoff_SUB_ARRAY[i] as selects (reference static block)."""
    return jnp.where(
        i > LIMIT_FOR_COST_3, POINTSoff_SUB3,
        jnp.where(i > 1, POINTSoff_SUB2, POINTSoff_SUB)).astype(I32)


def _ins_array(i):
    return jnp.where(
        i > LIMIT_FOR_COST_4, POINTSoff_INS4,
        jnp.where(i > LIMIT_FOR_COST_3, POINTSoff_INS3,
                  jnp.where(i > 1, POINTSoff_INS2, POINTSoff_INS))).astype(I32)


def _del_ext(streak):
    """Deletion extension penalty by current run length
    (reference: :770-776)."""
    return jnp.where(
        streak == 0, POINTSoff_DEL,
        jnp.where(streak < LIMIT_FOR_COST_3, POINTSoff_DEL2,
                  jnp.where(streak < LIMIT_FOR_COST_4, POINTSoff_DEL3,
                            jnp.where(streak < LIMIT_FOR_COST_5,
                                      POINTSoff_DEL4,
                                      jnp.where((streak & MASK5) == 0,
                                                POINTSoff_DEL5, 0))))
    ).astype(I32)


def _ins0_column(R: int) -> np.ndarray:
    """Cumulative insertion penalty for column 0 (reference ctor :95-104)."""
    col = np.zeros(R + 1, np.int64)
    for i in range(R + 1):
        prev = 0 if i < 2 else col[i - 1]
        col[i] = prev + POINTSoff_INS_ARRAY[i]
    return col.astype(np.int32)


def _wave_step(R: int, C: int, read1, read0, ref_rev_pad, carry, d):
    """One anti-diagonal. carry = (wave_{d-1}, wave_{d-2}) each (3, R+1).
    Returns new carry and the wave (3, R+1)."""
    prev1, prev2 = carry  # waves d-1 and d-2

    r_idx = jax.lax.broadcasted_iota(I32, (R + 1, 1), 0).reshape(R + 1)
    c_idx = d - r_idx  # column of each lane on this wave

    # reference window chars for this wave: ref1[r] = ref[c-1] = ref[d-r-1]
    # ref_rev_pad is ref reversed then padded with sentinel '!' on both sides
    # by (R+1); ref[j] for j in [0, C) sits at ref_rev_pad[C - 1 - j + (R+1)].
    # ref1[r] = ref[d-r-1] -> ref_rev_pad[C - d + r + R + 1]
    start = C - d + R + 1
    ref_slice = jax.lax.dynamic_slice(ref_rev_pad, (start,), (R + 2,))
    ref1 = ref_slice[:R + 1].astype(I32)
    ref0 = ref_slice[1:].astype(I32)  # ref[d-r-2]

    call1 = read1
    call0 = read0

    match = jnp.logical_and(call1 == ref1, ref1 != _N)
    prev_match = jnp.logical_and(call0 == ref0, ref0 != _N)
    gap = ref1 == GAPC

    # gather dependencies (vector shifts, not gathers)
    ms_dd = jnp.roll(prev2[MODE_MS], 1)   # (r-1) of wave d-2
    del_dd = jnp.roll(prev2[MODE_DEL], 1)
    ins_dd = jnp.roll(prev2[MODE_INS], 1)
    ms_left = prev1[MODE_MS]              # (r) of wave d-1
    del_left = prev1[MODE_DEL]
    ms_up = jnp.roll(prev1[MODE_MS], 1)   # (r-1) of wave d-1
    ins_up = jnp.roll(prev1[MODE_INS], 1)

    maxGain = (R - 1) * POINTSoff_MATCH2 + POINTSoff_MATCH
    subfloor = jnp.int32(-2 * maxGain)

    # ---- MS ----
    s_diag, s_del, s_ins = _score(ms_dd), _score(del_dd), _score(ins_dd)
    streak = _time(ms_dd)
    # match case
    m_ms = s_diag + jnp.where(prev_match, POINTSoff_MATCH2, POINTSoff_MATCH)
    m_d = s_del + POINTSoff_MATCH
    m_i = s_ins + POINTSoff_MATCH
    m_best = jnp.maximum(m_ms, jnp.maximum(m_d, m_i))
    m_from_ms = jnp.logical_and(m_ms >= m_d, m_ms >= m_i)
    m_time = jnp.where(m_from_ms & prev_match, streak + 1, 1)
    # mismatch case
    sub_pen = jnp.where(
        prev_match,
        jnp.where(streak <= 1, POINTSoff_SUBR, POINTSoff_SUB),
        _sub_array(streak + 1))
    x_ms = jnp.where(jnp.logical_and(ref1 != _N, call1 != _N),
                     s_diag + sub_pen, s_diag + POINTSoff_NOCALL)
    x_d = s_del + POINTSoff_SUB
    x_i = s_ins + POINTSoff_SUB
    x_best = jnp.maximum(x_ms, jnp.maximum(x_d, x_i))
    x_from_ms = jnp.logical_and(x_ms >= x_d, x_ms >= x_i)
    x_time = jnp.where(x_from_ms,
                       jnp.where(prev_match, 1, streak + 1), 1)
    ms_score = jnp.where(match, m_best, x_best)
    ms_time = _clamp_time(jnp.where(match, m_time, x_time))
    ms_val = jnp.where(gap, subfloor,
                       jnp.bitwise_or(ms_score, ms_time))

    # ---- DEL ----
    dstreak = _time(del_left)
    d_ms = _score(ms_left) + POINTSoff_DEL
    d_d = _score(del_left) + _del_ext(dstreak)
    refn_adj = jnp.where(ref1 == _N, POINTSoff_DEL_REF_N,
                         jnp.where(gap, POINTSoff_GAP, 0)).astype(I32)
    d_ms = d_ms + refn_adj
    d_d = d_d + refn_adj
    del_score = jnp.maximum(d_ms, d_d)
    del_time = _clamp_time(jnp.where(d_ms >= d_d, 1, dstreak + 1))
    del_barrier = jnp.logical_or(r_idx < BARRIER_D1, r_idx > R - BARRIER_D1)
    del_val = jnp.where(del_barrier, subfloor,
                        jnp.bitwise_or(del_score, del_time))

    # ---- INS ----
    istreak = _time(ins_up)
    i_ms = _score(ms_up) + POINTSoff_INS
    i_i = _score(ins_up) + _ins_array(istreak + 1)
    ins_score = jnp.maximum(i_ms, i_i)
    ins_time = _clamp_time(jnp.where(i_ms >= i_i, 1, istreak + 1))
    # reference: BARRIER_I2b = columns - 1 (:633)
    ins_barrier = jnp.logical_or(
        gap,
        jnp.logical_or(
            jnp.logical_and(r_idx < BARRIER_I1, c_idx > 1),
            jnp.logical_and(r_idx > R - BARRIER_I1, c_idx < C - 1)))
    ins_val = jnp.where(ins_barrier, subfloor,
                        jnp.bitwise_or(ins_score, ins_time))

    wave = jnp.stack([ms_val, del_val, ins_val])

    # boundary overrides: r==0 (row 0, c>=1) -> 0 ; r==d (col 0) -> INS0[r]
    ins0 = _INS0_CACHE(R)
    is_row0 = r_idx == 0
    is_col0 = r_idx == d
    bound = jnp.where(is_row0, 0, jnp.where(is_col0, ins0, 0))
    use_bound = jnp.logical_or(is_row0, is_col0)
    wave = jnp.where(use_bound[None, :], bound[None, :], wave)
    # cells outside the matrix (c<0 or c>C) -> BADoff (inert)
    invalid = jnp.logical_or(c_idx < 0, c_idx > C)
    wave = jnp.where(invalid[None, :], jnp.int32(BADoff), wave)

    return (wave, prev1), wave


@functools.lru_cache(maxsize=64)
def _ins0_np(R: int):
    return _ins0_column(R)


def _INS0_CACHE(R: int):
    return jnp.asarray(_ins0_np(R))


def _init_carry(R: int):
    """Wave 0 is the single cell (0,0)=0; wave -1 is all-inert."""
    w0 = np.full((3, R + 1), BADoff, np.int32)
    w0[:, 0] = 0  # cell (0, 0)
    wm1 = np.full((3, R + 1), BADoff, np.int32)
    return jnp.asarray(w0), jnp.asarray(wm1)


def _prep_read(read_codes_ascii, R):
    """read1[r] = read[r-1]; read0[r] = read[r-2] (sentinels '?' as in
    reference :656-659)."""
    read = read_codes_ascii.astype(I32)
    q = jnp.full((1,), ord("?"), I32)
    read1 = jnp.concatenate([q, read])         # length R+1
    read0 = jnp.concatenate([q, q, read[:-1]])  # length R+1
    return read1, read0


def _prep_ref(ref_ascii, R, C):
    pad = jnp.full((R + 1,), ord("!"), I32)
    return jnp.concatenate([pad, ref_ascii.astype(I32)[::-1], pad])


def _last_row_packed(waves, R, C):
    """Extract last-row packed cells: (R, c) lives on wave d=R+c.
    waves: (R+C, 3, R+1) of wave index d-1 (scan over d=1..R+C).
    Returns (3, C) packed for cols 1..C."""
    idx = jnp.arange(C) + R  # wave number d=R+c for c=1..C; ys index d-1
    return waves[idx, :, R].T  # (3, C)


def msa_score_single(read, ref, R: int, C: int):
    """Score one read vs one ref window. read: (R,) uint8 ascii codes;
    ref: (C,) uint8 ascii. Returns (max_score_unpacked, max_col, max_state).
    Tie-break matches the reference's state-major, column-minor first-max
    scan (reference :857-878)."""
    read1, read0 = _prep_read(read, R)
    ref_rev_pad = _prep_ref(ref, R, C)
    carry = _init_carry(R)
    step = functools.partial(_wave_step, R, C, read1, read0, ref_rev_pad)
    carry, waves = jax.lax.scan(step, carry, jnp.arange(1, R + C + 1))
    last = _last_row_packed(waves, R, C)  # (3, C)
    scores = _score(last)
    flat = scores.reshape(-1)  # state-major then col — matches scan order
    best = jnp.argmax(flat)    # argmax returns FIRST max: correct tie-break
    max_state = best // C
    max_col = best % C + 1
    max_score = flat[best].astype(jnp.int32) >> SCOREOFFSET
    return max_score, max_col, max_state


def msa_full_single(read, ref, R: int, C: int):
    """Like msa_score_single but also returns all waves for traceback:
    (R+C, 3, R+1) packed int32."""
    read1, read0 = _prep_read(read, R)
    ref_rev_pad = _prep_ref(ref, R, C)
    carry = _init_carry(R)
    step = functools.partial(_wave_step, R, C, read1, read0, ref_rev_pad)
    carry, waves = jax.lax.scan(step, carry, jnp.arange(1, R + C + 1))
    last = _last_row_packed(waves, R, C)
    scores = _score(last)
    flat = scores.reshape(-1)
    best = jnp.argmax(flat)
    max_state = best // C
    max_col = best % C + 1
    max_score = flat[best].astype(jnp.int32) >> SCOREOFFSET
    return waves, max_score, max_col, max_state


@functools.partial(jax.jit, static_argnums=(2, 3))
def msa_score_batch(reads, refs, R: int, C: int):
    """Batched score-only DP. reads: (B, R) uint8; refs: (B, C) uint8.
    Returns (scores, cols, states) each (B,)."""
    return jax.vmap(lambda rd, rf: msa_score_single(rd, rf, R, C))(
        reads, refs)


@functools.partial(jax.jit, static_argnums=(2, 3))
def msa_full_batch(reads, refs, R: int, C: int):
    return jax.vmap(lambda rd, rf: msa_full_single(rd, rf, R, C))(
        reads, refs)


def waves_to_packed(waves: np.ndarray, R: int, C: int) -> np.ndarray:
    """Host-side: wave layout (R+C, 3, R+1) -> matrix layout
    (3, R+1, C+1) for the oracle traceback walk. Cell (s, r, c) lives on
    wave d=r+c (ys index d-1) at lane r."""
    out = np.full((3, R + 1, C + 1), BADoff, np.int64)
    ins0 = _ins0_np(R)
    out[:, 0, :] = 0
    for r in range(R + 1):
        out[:, r, 0] = ins0[r]
    d = np.add.outer(np.arange(R + 1), np.arange(C + 1))  # r+c
    for r in range(1, R + 1):
        cs = np.arange(1, C + 1)
        out[:, r, 1:] = waves[r + cs - 1, :, r].T
    return out
