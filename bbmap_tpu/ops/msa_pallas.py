"""Pallas TPU kernel for the multi-state banded affine DP (score pass).

The XLA-scan formulation (ops/msa_jax.py) round-trips its carry through
HBM every wave; this kernel keeps the whole wavefront state in VMEM for a
block of reads and sweeps all R+C anti-diagonals in one fori_loop —
the speed-of-light layout for the reference's hottest loop
(reference: align2/MultiStateAligner11ts.fillLimited / jni/
MultiStateAligner11tsJNI.c:753).

Same packed int32 ``score << 11 | streak`` cell encoding and identical
scoring semantics; per-read true row counts (variable lengths) supported
via a one-hot last-row mask.

Layout per block: wave state (2, 3, BB, R+1) int32 in VMEM scratch
(double-buffered by wave parity); reads/refs pre-expanded host-side to
the wave-step operand layout (read1/read0 int32 and the reversed padded
ref window).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.constants import (
    BADoff, BARRIER_D1, BARRIER_I1, GAPC, LIMIT_FOR_COST_3, LIMIT_FOR_COST_4,
    LIMIT_FOR_COST_5, MASK5, MAX_TIME, MODE_DEL, MODE_INS, MODE_MS,
    POINTSoff_DEL, POINTSoff_DEL2, POINTSoff_DEL3, POINTSoff_DEL4,
    POINTSoff_DEL5, POINTSoff_DEL_REF_N, POINTSoff_GAP, POINTSoff_INS,
    POINTSoff_INS2, POINTSoff_INS3, POINTSoff_INS4,
    POINTSoff_MATCH, POINTSoff_MATCH2, POINTSoff_NOCALL, POINTSoff_SUB,
    POINTSoff_SUB2, POINTSoff_SUB3, POINTSoff_SUBR, SCOREOFFSET, TIMEMASK,
)
from .msa_jax import _ins0_np

_N = ord("N")
I32 = jnp.int32
_SCOREMASK_INT = ~TIMEMASK  # python int; jnp scalars made in-kernel only
NEG_INF = -(2 ** 31) + 2


def _score(p):
    return jnp.bitwise_and(p, jnp.int32(_SCOREMASK_INT))


def _time(p):
    return jnp.bitwise_and(p, jnp.int32(TIMEMASK))


def _clamp_time(t):
    return jnp.where(t > MAX_TIME, MAX_TIME - MASK5, t)


def _sub_array(i):
    return jnp.where(i > LIMIT_FOR_COST_3, POINTSoff_SUB3,
                     jnp.where(i > 1, POINTSoff_SUB2,
                               POINTSoff_SUB)).astype(I32)


def _ins_array(i):
    return jnp.where(
        i > LIMIT_FOR_COST_4, POINTSoff_INS4,
        jnp.where(i > LIMIT_FOR_COST_3, POINTSoff_INS3,
                  jnp.where(i > 1, POINTSoff_INS2,
                            POINTSoff_INS))).astype(I32)


def _del_ext(streak):
    return jnp.where(
        streak == 0, POINTSoff_DEL,
        jnp.where(streak < LIMIT_FOR_COST_3, POINTSoff_DEL2,
                  jnp.where(streak < LIMIT_FOR_COST_4, POINTSoff_DEL3,
                            jnp.where(streak < LIMIT_FOR_COST_5,
                                      POINTSoff_DEL4,
                                      jnp.where((streak & MASK5) == 0,
                                                POINTSoff_DEL5, 0))))
    ).astype(I32)


def _roll1(x):
    """shift +1 along the last axis (lane 0 garbage, overwritten by
    boundary handling)."""
    return pltpu.roll(x, 1, axis=x.ndim - 1)


def _make_kernel(R: int, C: int, BB: int):
    n_waves = R + C
    Rp1 = R + 1

    def kernel(read1_ref, read0_ref, refpad_ref, rows_ref, ins0_ref,
               out_ref, wave_ref, best_ref, refroll_ref):
        r_idx = jax.lax.broadcasted_iota(I32, (BB, Rp1), 1)
        rows = rows_ref[:]                      # (BB, 1) int32
        lane_mask = r_idx == rows               # one-hot last row
        read1 = read1_ref[:]
        read0 = read0_ref[:]
        ins0 = ins0_ref[:]                      # (1, Rp1)
        maxGain = (rows - 1) * POINTSoff_MATCH2 + POINTSoff_MATCH
        subfloor = (-2 * maxGain).astype(I32)   # (BB, 1)

        # init wave slots: wave -1 (slot 1) all BAD; wave 0 (slot 0):
        # cell (0,0)=0 else BAD
        bad = jnp.full((3, BB, Rp1), BADoff, I32)
        w0 = jnp.where(r_idx[None] == 0, 0, bad)
        wave_ref[0] = w0
        wave_ref[1] = bad
        best_ref[0] = jnp.full((3, BB), NEG_INF, I32)   # scores
        best_ref[1] = jnp.zeros((3, BB), I32)           # cols
        # ref window ring: input arrives pre-rotated for wave 1; rotating
        # right by one lane per wave keeps the window at a STATIC offset
        # (Mosaic cannot load at unaligned dynamic lane offsets)
        refroll_ref[:] = refpad_ref[:]

        def body(d, _):
            slot = jax.lax.rem(d, 2)
            prev2 = wave_ref[slot]
            prev1 = wave_ref[1 - slot]
            c_idx = d - r_idx

            ref_slice = refroll_ref[:, :Rp1 + 1]
            ref1 = ref_slice[:, :Rp1]
            ref0 = ref_slice[:, 1:]

            match = jnp.logical_and(read1 == ref1, ref1 != _N)
            prev_match = jnp.logical_and(read0 == ref0, ref0 != _N)
            gap = ref1 == GAPC

            ms_dd = _roll1(prev2[MODE_MS])
            del_dd = _roll1(prev2[MODE_DEL])
            ins_dd = _roll1(prev2[MODE_INS])
            ms_left = prev1[MODE_MS]
            del_left = prev1[MODE_DEL]
            ms_up = _roll1(prev1[MODE_MS])
            ins_up = _roll1(prev1[MODE_INS])

            s_diag, s_del, s_ins = (_score(ms_dd), _score(del_dd),
                                    _score(ins_dd))
            streak = _time(ms_dd)
            m_ms = s_diag + jnp.where(prev_match, POINTSoff_MATCH2,
                                      POINTSoff_MATCH)
            m_d = s_del + POINTSoff_MATCH
            m_i = s_ins + POINTSoff_MATCH
            m_best = jnp.maximum(m_ms, jnp.maximum(m_d, m_i))
            m_from_ms = jnp.logical_and(m_ms >= m_d, m_ms >= m_i)
            m_time = jnp.where(m_from_ms & prev_match, streak + 1, 1)
            sub_pen = jnp.where(
                prev_match,
                jnp.where(streak <= 1, POINTSoff_SUBR, POINTSoff_SUB),
                _sub_array(streak + 1))
            x_ms = jnp.where(jnp.logical_and(ref1 != _N, read1 != _N),
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

            dstreak = _time(del_left)
            d_ms = _score(ms_left) + POINTSoff_DEL
            d_d = _score(del_left) + _del_ext(dstreak)
            refn_adj = jnp.where(ref1 == _N, POINTSoff_DEL_REF_N,
                                 jnp.where(gap, POINTSoff_GAP,
                                           0)).astype(I32)
            d_ms = d_ms + refn_adj
            d_d = d_d + refn_adj
            del_score = jnp.maximum(d_ms, d_d)
            del_time = _clamp_time(jnp.where(d_ms >= d_d, 1, dstreak + 1))
            del_barrier = jnp.logical_or(r_idx < BARRIER_D1,
                                         r_idx > rows - BARRIER_D1)
            del_val = jnp.where(del_barrier, subfloor,
                                jnp.bitwise_or(del_score, del_time))

            istreak = _time(ins_up)
            i_ms = _score(ms_up) + POINTSoff_INS
            i_i = _score(ins_up) + _ins_array(istreak + 1)
            ins_score = jnp.maximum(i_ms, i_i)
            ins_time = _clamp_time(jnp.where(i_ms >= i_i, 1, istreak + 1))
            ins_barrier = jnp.logical_or(
                gap,
                jnp.logical_or(
                    jnp.logical_and(r_idx < BARRIER_I1, c_idx > 1),
                    jnp.logical_and(r_idx > rows - BARRIER_I1,
                                    c_idx < C - 1)))
            ins_val = jnp.where(ins_barrier, subfloor,
                                jnp.bitwise_or(ins_score, ins_time))

            wave = jnp.stack([ms_val, del_val, ins_val])

            is_row0 = r_idx == 0
            is_col0 = r_idx == d
            bound = jnp.where(is_row0, 0, jnp.where(is_col0, ins0, 0))
            use_bound = jnp.logical_or(is_row0, is_col0)
            wave = jnp.where(use_bound[None], bound[None], wave)
            invalid = jnp.logical_or(jnp.logical_or(c_idx < 0, c_idx > C),
                                     r_idx > rows)
            wave = jnp.where(invalid[None], jnp.int32(BADoff), wave)
            wave_ref[slot] = wave

            # last-row tracking at lane rows[b]
            val = jnp.max(jnp.where(lane_mask[None], _score(wave),
                                    NEG_INF), axis=2)       # (3, BB)
            col = (d - rows[:, 0])[None, :]                  # (1, BB)
            on_last = jnp.logical_and(col >= 1, col <= C)
            bs = best_ref[0]
            take = jnp.logical_and(on_last, val > bs)
            best_ref[0] = jnp.where(take, val, bs)
            best_ref[1] = jnp.where(take, jnp.broadcast_to(col, (3, BB)),
                                    best_ref[1])
            refroll_ref[:] = pltpu.roll(refroll_ref[:], 1, axis=1)
            return 0

        jax.lax.fori_loop(1, n_waves + 1, body, 0)

        bs = best_ref[0]          # (3, BB)
        bc = best_ref[1]
        # first-max over states in MS, DEL, INS order (int argmax is not
        # lowerable on TPU Pallas; explicit compare chain instead)
        b0, b1, b2 = bs[0], bs[1], bs[2]
        state = jnp.where(jnp.logical_and(b0 >= b1, b0 >= b2), 0,
                          jnp.where(b1 >= b2, 1, 2)).astype(I32)
        score = jnp.where(state == 0, b0, jnp.where(state == 1, b1, b2))
        col = jnp.where(state == 0, bc[0],
                        jnp.where(state == 1, bc[1], bc[2]))
        out = jnp.stack(
            [jnp.right_shift(score, SCOREOFFSET), col, state], axis=1)
        out_ref[:] = out

    return kernel


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def msa_score_pallas(read1, read0, refpad_rows, R: int, C: int, BB: int):
    """read1/read0: (B, R+1) int32 operand layout; refpad_rows: tuple of
    (refpad (B, C+2R+2) int32, rows (B, 1) int32). Returns (B, 3) int32
    [score, col, state]."""
    refpad, rows = refpad_rows
    B = read1.shape[0]
    assert B % BB == 0
    Rp1 = R + 1
    ins0 = jnp.asarray(_ins0_np(R))[None, :]
    grid = (B // BB,)
    kernel = _make_kernel(R, C, BB)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, 3), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BB, Rp1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, Rp1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, refpad.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Rp1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BB, 3), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 3, BB, Rp1), jnp.int32),
            pltpu.VMEM((2, 3, BB), jnp.int32),
            pltpu.VMEM((BB, refpad.shape[1]), jnp.int32),
        ],
    )(read1, read0, refpad, rows, ins0)
    return out


def prep_operands(reads: np.ndarray, refs: np.ndarray,
                  rows: np.ndarray) -> Tuple[np.ndarray, np.ndarray,
                                             np.ndarray, np.ndarray]:
    """Host-side operand expansion for the kernel: read1[r]=read[r-1],
    read0[r]=read[r-2] (sentinels), ref reversed + padded by R+1 '!'."""
    B, R = reads.shape
    C = refs.shape[1]
    q = ord("?")
    read1 = np.full((B, R + 1), q, np.int32)
    read1[:, 1:] = reads
    read0 = np.full((B, R + 1), q, np.int32)
    read0[:, 2:] = reads[:, :-1]
    refpad = np.full((B, C + 2 * (R + 1)), ord("!"), np.int32)
    refpad[:, R + 1:R + 1 + C] = refs[:, ::-1]
    # pre-rotate for wave 1 (window start C+R); the kernel rotates right
    # one lane per wave
    refpad = np.roll(refpad, -(C + R), axis=1)
    return read1, read0, refpad, rows.reshape(-1, 1).astype(np.int32)


# ---------------------------------------------------------------------------
# Transposed-layout kernels: state (3, R+1, BB) with JOBS ON THE LANE
# AXIS (BB a multiple of 128) and rows on sublanes. The original layout
# put rows on lanes, padding 151 -> 256 lanes (41% waste) and paying
# cross-lane rolls; here rolls are sublane rotations and lanes are full.
# Measured 2.4x over the XLA scan at the fused-path shapes (12288 jobs,
# R=150, C=222: 0.118s vs 0.28s). Profile-parameterized (SHORT/PACBIO).
# ---------------------------------------------------------------------------

from ..core.constants import SHORT_PROFILE as _SHORT_P


def _make_kernel_t(R: int, C: int, BB: int, P, want_prevs: bool):
    n_waves = R + C
    Rp1 = R + 1
    SCOREMASK_INT = ~P.TIMEMASK
    L3, L4, L5 = (P.LIMIT_FOR_COST_3, P.LIMIT_FOR_COST_4,
                  P.LIMIT_FOR_COST_5)

    def _score_p(p):
        return jnp.bitwise_and(p, jnp.int32(SCOREMASK_INT))

    def _time_p(p):
        return jnp.bitwise_and(p, jnp.int32(P.TIMEMASK))

    def _clamp_time_p(t):
        return jnp.where(t > P.MAX_TIME, P.MAX_TIME - P.MASK5, t)

    def _sub_array_p(i):
        return jnp.where(i > L3, P.POINTSoff_SUB3,
                         jnp.where(i > 1, P.POINTSoff_SUB2,
                                   P.POINTSoff_SUB)).astype(I32)

    def _ins_array_p(i):
        return jnp.where(
            i > L4, P.POINTSoff_INS4,
            jnp.where(i > L3, P.POINTSoff_INS3,
                      jnp.where(i > 1, P.POINTSoff_INS2,
                                P.POINTSoff_INS))).astype(I32)

    def _del_ext_p(streak):
        return jnp.where(
            streak == 0, P.POINTSoff_DEL,
            jnp.where(streak < L3, P.POINTSoff_DEL2,
                      jnp.where(streak < L4, P.POINTSoff_DEL3,
                                jnp.where(streak < L5,
                                          P.POINTSoff_DEL4,
                                          jnp.where((streak & P.MASK5)
                                                    == 0,
                                                    P.POINTSoff_DEL5,
                                                    0))))).astype(I32)

    def _rollr(x):
        # +1 shift along the ROW (sublane) axis
        return pltpu.roll(x, 1, axis=x.ndim - 2)

    def kernel(read1_ref, read0_ref, refpad_ref, rows_ref, ins0_ref,
               out_ref, *rest):
        if want_prevs:
            prevs_ref, wave_ref, best_ref, refroll_ref = rest
        else:
            wave_ref, best_ref, refroll_ref = rest
        r_idx = jax.lax.broadcasted_iota(I32, (Rp1, BB), 0)
        rows = rows_ref[:]                      # (1, BB)
        lane_mask = r_idx == rows
        read1 = read1_ref[:]                    # (Rp1, BB)
        read0 = read0_ref[:]
        ins0 = ins0_ref[:]                      # (Rp1, 1)
        maxGain = (rows - 1) * P.POINTSoff_MATCH2 + P.POINTSoff_MATCH
        subfloor = (-2 * maxGain).astype(I32)

        bad = jnp.full((3, Rp1, BB), P.BADoff, I32)
        wave_ref[0] = jnp.where(r_idx[None] == 0, 0, bad)
        wave_ref[1] = bad
        best_ref[0] = jnp.full((3, BB), NEG_INF, I32)
        best_ref[1] = jnp.zeros((3, BB), I32)
        refroll_ref[:] = refpad_ref[:]

        def body(d, _):
            slot = jax.lax.rem(d, 2)
            prev2 = wave_ref[slot]
            prev1 = wave_ref[1 - slot]
            c_idx = d - r_idx

            ref_slice = refroll_ref[:Rp1 + 1]
            ref1 = ref_slice[:Rp1]
            ref0 = ref_slice[1:]

            match = jnp.logical_and(read1 == ref1, ref1 != _N)
            prev_match = jnp.logical_and(read0 == ref0, ref0 != _N)
            gap = ref1 == GAPC

            dd = _rollr(prev2)
            ms_dd, del_dd, ins_dd = dd[MODE_MS], dd[MODE_DEL], \
                dd[MODE_INS]
            up = _rollr(prev1)
            ms_left = prev1[MODE_MS]
            del_left = prev1[MODE_DEL]
            ms_up = up[MODE_MS]
            ins_up = up[MODE_INS]

            s_diag, s_del, s_ins = (_score_p(ms_dd), _score_p(del_dd),
                                    _score_p(ins_dd))
            streak = _time_p(ms_dd)
            m_ms = s_diag + jnp.where(prev_match, P.POINTSoff_MATCH2,
                                      P.POINTSoff_MATCH)
            m_d = s_del + P.POINTSoff_MATCH
            m_i = s_ins + P.POINTSoff_MATCH
            m_best = jnp.maximum(m_ms, jnp.maximum(m_d, m_i))
            m_from_ms = jnp.logical_and(m_ms >= m_d, m_ms >= m_i)
            m_time = jnp.where(m_from_ms & prev_match, streak + 1, 1)
            sub_pen = jnp.where(
                prev_match,
                jnp.where(streak <= 1, P.POINTSoff_SUBR,
                          P.POINTSoff_SUB),
                _sub_array_p(streak + 1))
            x_ms = jnp.where(jnp.logical_and(ref1 != _N, read1 != _N),
                             s_diag + sub_pen,
                             s_diag + P.POINTSoff_NOCALL)
            x_d = s_del + P.POINTSoff_SUB
            x_i = s_ins + P.POINTSoff_SUB
            x_best = jnp.maximum(x_ms, jnp.maximum(x_d, x_i))
            x_from_ms = jnp.logical_and(x_ms >= x_d, x_ms >= x_i)
            x_time = jnp.where(x_from_ms,
                               jnp.where(prev_match, 1, streak + 1), 1)
            ms_score = jnp.where(match, m_best, x_best)
            ms_time = _clamp_time_p(jnp.where(match, m_time, x_time))
            ms_val = jnp.where(gap, subfloor,
                               jnp.bitwise_or(ms_score, ms_time))

            dstreak = _time_p(del_left)
            d_ms = _score_p(ms_left) + P.POINTSoff_DEL
            d_d = _score_p(del_left) + _del_ext_p(dstreak)
            refn_adj = jnp.where(ref1 == _N, P.POINTSoff_DEL_REF_N,
                                 jnp.where(gap, P.POINTSoff_GAP,
                                           0)).astype(I32)
            d_ms = d_ms + refn_adj
            d_d = d_d + refn_adj
            del_score = jnp.maximum(d_ms, d_d)
            del_time = _clamp_time_p(jnp.where(d_ms >= d_d, 1,
                                               dstreak + 1))
            del_barrier = jnp.logical_or(r_idx < P.BARRIER_D1,
                                         r_idx > rows - P.BARRIER_D1)
            del_val = jnp.where(del_barrier, subfloor,
                                jnp.bitwise_or(del_score, del_time))

            istreak = _time_p(ins_up)
            i_ms = _score_p(ms_up) + P.POINTSoff_INS
            i_i = _score_p(ins_up) + _ins_array_p(istreak + 1)
            ins_score = jnp.maximum(i_ms, i_i)
            ins_time = _clamp_time_p(jnp.where(i_ms >= i_i, 1,
                                               istreak + 1))
            ins_barrier = jnp.logical_or(
                gap,
                jnp.logical_or(
                    jnp.logical_and(r_idx < P.BARRIER_I1, c_idx > 1),
                    jnp.logical_and(r_idx > rows - P.BARRIER_I1,
                                    c_idx < C - 1)))
            ins_val = jnp.where(ins_barrier, subfloor,
                                jnp.bitwise_or(ins_score, ins_time))

            wave = jnp.stack([ms_val, del_val, ins_val])

            is_row0 = r_idx == 0
            is_col0 = r_idx == d
            bound = jnp.where(is_row0, 0, jnp.where(is_col0, ins0, 0))
            use_bound = jnp.logical_or(is_row0, is_col0)
            wave = jnp.where(use_bound[None], bound[None], wave)
            invalid = jnp.logical_or(
                jnp.logical_or(c_idx < 0, c_idx > C), r_idx > rows)
            wave = jnp.where(invalid[None], jnp.int32(P.BADoff), wave)
            wave_ref[slot] = wave

            if want_prevs:
                # 2-bit prev-state codes per state (reference:
                # traceback2 :1122-1133; packing matches
                # msa_jax._wave_step:237)
                ms_prev_arg = jnp.where(
                    jnp.logical_and(s_diag >= s_del, s_diag >= s_ins),
                    MODE_MS,
                    jnp.where(s_del >= s_ins, MODE_DEL, MODE_INS))
                ms_prev = jnp.where(ms_time > 1, MODE_MS, ms_prev_arg)
                del_prev_arg = jnp.where(
                    _score_p(ms_left) >= _score_p(del_left),
                    MODE_MS, MODE_DEL)
                del_prev = jnp.where(del_time > 1, MODE_DEL,
                                     del_prev_arg)
                ins_prev_arg = jnp.where(
                    _score_p(ms_up) >= _score_p(ins_up),
                    MODE_MS, MODE_INS)
                ins_prev = jnp.where(ins_time > 1, MODE_INS,
                                     ins_prev_arg)
                codes = (ms_prev | (del_prev << 2)
                         | (ins_prev << 4)).astype(jnp.uint8)
                prevs_ref[pl.ds(d - 1, 1)] = codes[None]

            val = jnp.max(jnp.where(lane_mask[None], _score_p(wave),
                                    NEG_INF), axis=1)        # (3, BB)
            col = d - rows                                   # (1, BB)
            on_last = jnp.logical_and(col >= 1, col <= C)
            bs = best_ref[0]
            take = jnp.logical_and(on_last, val > bs)
            best_ref[0] = jnp.where(take, val, bs)
            best_ref[1] = jnp.where(take,
                                    jnp.broadcast_to(col, (3, BB)),
                                    best_ref[1])
            refroll_ref[:] = pltpu.roll(refroll_ref[:], 1, axis=0)
            return 0

        jax.lax.fori_loop(1, n_waves + 1, body, 0)

        bs = best_ref[0]
        bc = best_ref[1]
        b0, b1, b2 = bs[0], bs[1], bs[2]
        state = jnp.where(jnp.logical_and(b0 >= b1, b0 >= b2), 0,
                          jnp.where(b1 >= b2, 1, 2)).astype(I32)
        score = jnp.where(state == 0, b0, jnp.where(state == 1, b1, b2))
        col = jnp.where(state == 0, bc[0],
                        jnp.where(state == 1, bc[1], bc[2]))
        out_ref[:] = jnp.stack(
            [jnp.right_shift(score, P.SCOREOFFSET), col, state], axis=0)

    return kernel


def _pallas_t(read1, read0, refpad, rows, R: int, C: int, BB: int, P,
              want_prevs: bool):
    Rp1 = R + 1
    n_waves = R + C
    B = read1.shape[1]
    assert B % BB == 0
    ins0 = jnp.asarray(_ins0_np(R, P))[:, None]
    grid = (B // BB,)
    kernel = _make_kernel_t(R, C, BB, P, want_prevs)
    out_shapes = [jax.ShapeDtypeStruct((3, B), jnp.int32)]
    out_specs = [pl.BlockSpec((3, BB), lambda i: (0, i),
                              memory_space=pltpu.VMEM)]
    if want_prevs:
        out_shapes.append(
            jax.ShapeDtypeStruct((n_waves, Rp1, B), jnp.uint8))
        out_specs.append(
            pl.BlockSpec((n_waves, Rp1, BB), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM))
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid=grid,
        interpret=jax.default_backend() == "cpu",
        # the fill variant's double-buffered prev-code output block
        # slightly exceeds the 16 MB default scoped-vmem budget at
        # BB=128, L=150 windows; lanes must stay a multiple of 128
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec((Rp1, BB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Rp1, BB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((refpad.shape[0], BB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Rp1, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2, 3, Rp1, BB), jnp.int32),
            pltpu.VMEM((2, 3, BB), jnp.int32),
            pltpu.VMEM((refpad.shape[0], BB), jnp.int32),
        ],
    )(read1, read0, refpad, rows, ins0)
    return outs


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7))
def msa_score_pallas_t(read1, read0, refpad, rows, R: int, C: int,
                       BB: int = 512, P=None):
    """Transposed-layout score kernel. read1/read0: (R+1, B) int32;
    refpad: (C+2R+2, B) int32 (reversed, pre-rotated); rows: (1, B).
    Returns (3, B) int32 [score>>off, col, state]."""
    if P is None:
        P = _SHORT_P
    return _pallas_t(read1, read0, refpad, rows, R, C, BB, P, False)[0]


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7))
def msa_fill_pallas_t(read1, read0, refpad, rows, R: int, C: int,
                      BB: int = 128, P=None):
    """Fill + prev-code emission: returns ((3, B) results,
    (R+C, R+1, B) uint8 packed prev-state codes — the same codes
    msa_jax._scan(want_prevs=True) produces, job axis last)."""
    if P is None:
        P = _SHORT_P
    out, prevs = _pallas_t(read1, read0, refpad, rows, R, C, BB, P,
                           True)
    return out, prevs


def prep_operands_t_device(reads, refs, rows, R: int, C: int):
    """Device-side transposed operand prep (jnp; used inside jit).
    reads: (B, R) uint8 ascii; refs: (B, C) uint8 ascii; rows: (B,)."""
    B = reads.shape[0]
    q = ord("?")
    read1 = jnp.concatenate(
        [jnp.full((1, B), q, I32), reads.astype(I32).T], axis=0)
    read0 = jnp.concatenate(
        [jnp.full((2, B), q, I32), reads[:, :-1].astype(I32).T], axis=0)
    refpad = jnp.full((C + 2 * (R + 1), B), ord("!"), I32)
    refpad = refpad.at[R + 1:R + 1 + C].set(refs[:, ::-1].astype(I32).T)
    refpad = jnp.roll(refpad, -(C + R), axis=0)
    return read1, read0, refpad, rows.reshape(1, -1).astype(I32)


def score_batch(reads: np.ndarray, refs: np.ndarray,
                rows: np.ndarray, BB: int = 64):
    """Convenience wrapper: (B, R) uint8 reads, (B, C) uint8 refs,
    (B,) rows -> (scores, cols, states) numpy arrays."""
    B, R = reads.shape
    C = refs.shape[1]
    pad = (-B) % BB
    if pad:
        reads = np.concatenate(
            [reads, np.full((pad, R), _N, np.uint8)])
        refs = np.concatenate([refs, np.full((pad, C), _N, np.uint8)])
        rows = np.concatenate([rows, np.full(pad, R, np.int32)])
    r1, r0, rp, rw = prep_operands(reads, refs, rows)
    out = np.asarray(msa_score_pallas(r1, r0, (rp, rw), R, C, BB))[:B]
    return out[:, 0], out[:, 1], out[:, 2]
