"""Device-resident DP escalation: fixed-shape score / fill+traceback
programs that gather their reference windows from the 2-bit packed genome
already living in HBM (the same arrays the quickmap uses).

Replaces the round-1 host escalation path (per-row Python window fills,
one DP program per distinct window width) with exactly FOUR compiled
programs per read length — narrow/wide x score/trace — so steady state
never recompiles and never ships reference windows over the host link
(reference: align2/BBMapThread.scoreSlow:252-345 fillAndScoreLimited
scores every retained site; traceback runs on kept sites only :309-345).

Window model: a job is (read row, strand, window start). The window is
``C`` reference bases from flat genome position ``wstart``; C is one of
two static widths:

- narrow: L + 2*PAD + 64   (covers chain spreads <= 64 — in practice
  >99.9% of jobs; indels wider than 64 bp at a single site are the
  long-indel pass's business)
- wide:   L + 2*PAD + 448  (the rest, spreads clamped to 448 as before)
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import msa_jax
from .quickmap_device import extract_ref_codes

I32 = jnp.int32
SLOW_ALIGN_PADDING = 4
NARROW_SPREAD = 16
WIDE_SPREAD = 448
SCORE_CHUNKS = (8192, 4096, 2048, 1024)  # greedy chunk ladder (narrow)
# — a job count decomposes into descending power-of-two dispatches, so
# padding waste is <= 1023 jobs instead of chunk-1 (a 9.7k-job batch
# pads 41% with one fixed 8192 chunk, 6% with the ladder); every size
# compiles once and the persistent cache keeps warm starts cheap
SCORE_CHUNKS_W = (1024,)                 # wide jobs are rare
TRACE_CHUNKS = (2048, 1024, 512)
TRACE_CHUNKS_W = (1024,)


def _trace_ladder(L: int, C: int, ladder):
    """Memory-aware trace-chunk ladder: the fill's prev-code block is
    ~(L+C)*(L+1) bytes PER JOB — 72 MB at the 6 kbp PacBio envelope,
    where the short-read ladder (512+) would allocate tens of GB.
    Budget ~2 GB per launch; always keep at least chunk size 8."""
    cap = max(8, (2 << 30) // max(1, (L + C) * (L + 1)))
    out = tuple(c for c in ladder if c <= cap)
    if not out:
        c = 8
        while c * 2 <= cap:
            c *= 2
        out = (c,)
    return out


def _greedy_chunks(n: int, ladder):
    """Yield (start, stop, size) covering [0, n) with descending
    power-of-two sizes; the tail uses the smallest size."""
    a = 0
    for size in ladder:
        while n - a >= size:
            yield a, a + size, size
            a += size
    if a < n:
        yield a, n, ladder[-1]


def _codes_to_ascii_dev(codes, is_n):
    """2-bit genome codes -> ASCII bases on device, arithmetically
    (A65 C67 G71 T84; N for undefined/out-of-bounds)."""
    c = codes.astype(I32)
    a = 65 + 2 * c + 2 * (c >= 2).astype(I32) + 11 * (c == 3).astype(I32)
    return jnp.where(is_n, 78, a).astype(jnp.uint8)


class DeviceWindows:
    """Holds the device-resident packed genome handles for window
    gathers (shared with the quickmap via build-time injection)."""

    def __init__(self, gpack_d, nmask_d, G: int):
        self.gpack_d = gpack_d
        self.nmask_d = nmask_d
        self.G = G


def make_programs(L: int, dw: DeviceWindows, profile=None):
    """Build the four fixed-shape programs for read length L. Returns a
    dict with 'score_n', 'score_w', 'trace_n', 'trace_w' callables taking
    (reads (J, L) uint8 ascii, wstart (J,) int32) -> device arrays."""
    G = dw.G
    gpack_d, nmask_d = dw.gpack_d, dw.nmask_d
    if profile is None:
        from ..core.constants import SHORT_PROFILE
        profile = SHORT_PROFILE

    def build(C: int, trace: bool):
        def prog(reads, wstart):
            codes, isn = extract_ref_codes(gpack_d, nmask_d,
                                           wstart.astype(I32), C, G)
            refs = _codes_to_ascii_dev(codes, isn)          # (J, C)
            if trace:
                return jax.vmap(
                    lambda rd, rf: msa_jax._align_single(rd, rf, L, C,
                                                         P=profile)
                )(reads, refs)
            return jax.vmap(
                lambda rd, rf: msa_jax.msa_score_single(rd, rf, L, C,
                                                        profile)
            )(reads, refs)
        return jax.jit(prog)

    Cn = L + 2 * SLOW_ALIGN_PADDING + NARROW_SPREAD
    Cw = L + 2 * SLOW_ALIGN_PADDING + WIDE_SPREAD
    return {
        "Cn": Cn, "Cw": Cw,
        "score_n": build(Cn, False),
        "score_w": build(Cw, False),
        "trace_n": build(Cn, True),
        "trace_w": build(Cw, True),
    }


def score_jobs_launch(progs: Dict, reads: np.ndarray,
                      wstart: np.ndarray, wide: np.ndarray):
    """Dispatch all score chunks WITHOUT blocking; returns a launch
    list for score_jobs_fetch. Lets callers overlap several job
    families (e.g. speculative traces) in one device queue."""
    launches = []   # (job_index_array, device score array)
    for is_wide, key, ladder in ((False, "score_n", SCORE_CHUNKS),
                                 (True, "score_w", SCORE_CHUNKS_W)):
        rows = np.nonzero(wide == is_wide)[0]
        if not len(rows):
            continue
        prog = progs[key]
        for a, b, chunk in _greedy_chunks(len(rows), ladder):
            sel = rows[a:b]
            rpad = np.full((chunk, reads.shape[1]), ord("N"), np.uint8)
            wpad = np.zeros(chunk, np.int32)
            rpad[:len(sel)] = reads[sel]
            wpad[:len(sel)] = wstart[sel]
            sc, col, st = prog(rpad, wpad)
            try:
                sc.copy_to_host_async()
            except Exception:
                pass
            launches.append((sel, sc))
    return launches


def score_jobs_fetch(launches, J: int) -> np.ndarray:
    out = np.full(J, -(2 ** 30), np.int64)
    for sel, sc in launches:
        out[sel] = np.asarray(sc)[:len(sel)].astype(np.int64)
    return out


def score_jobs(progs: Dict, reads: np.ndarray, wstart: np.ndarray,
               wide: np.ndarray) -> np.ndarray:
    """Score all jobs (reads (J, L) ascii oriented to the window strand,
    wstart flat genome coords, wide bool per job). Dispatches fixed-size
    chunks for both width classes, overlapping all transfers; returns
    scores (J,) int64."""
    return score_jobs_fetch(
        score_jobs_launch(progs, reads, wstart, wide), len(wstart))


def trace_jobs_launch(progs: Dict, reads: np.ndarray,
                      wstart: np.ndarray, wide: np.ndarray):
    """Dispatch all fill+traceback chunks without blocking."""
    L = reads.shape[1]
    launches = []
    for is_wide, key, ladder0 in ((False, "trace_n", TRACE_CHUNKS),
                                  (True, "trace_w", TRACE_CHUNKS_W)):
        L = reads.shape[1]
        C = progs["Cw"] if is_wide else progs["Cn"]
        ladder = _trace_ladder(L, C, ladder0)
        rows = np.nonzero(wide == is_wide)[0]
        if not len(rows):
            continue
        prog = progs[key]
        for a, b, chunk in _greedy_chunks(len(rows), ladder):
            sel = rows[a:b]
            rpad = np.full((chunk, L), ord("N"), np.uint8)
            wpad = np.zeros(chunk, np.int32)
            rpad[:len(sel)] = reads[sel]
            wpad[:len(sel)] = wstart[sel]
            outs = prog(rpad, wpad)
            for o in outs:
                try:
                    o.copy_to_host_async()
                except Exception:
                    pass
            launches.append((sel, outs))
    return launches


def trace_jobs_fetch(progs: Dict, launches, J: int, L: int):
    Cw = progs["Cw"]
    sym = np.zeros((J, L + Cw), np.uint8)
    ln = np.zeros(J, np.int32)
    gaps = np.zeros(J, np.int32)
    score = np.full(J, -(2 ** 30), np.int64)
    col = np.zeros(J, np.int32)
    for sel, (s_, l_, g_, sc_, c_, st_) in launches:
        s_h = np.asarray(s_)[:len(sel)]
        sym[sel, :s_h.shape[1]] = s_h
        ln[sel] = np.asarray(l_)[:len(sel)]
        gaps[sel] = np.asarray(g_)[:len(sel)]
        score[sel] = np.asarray(sc_)[:len(sel)].astype(np.int64)
        col[sel] = np.asarray(c_)[:len(sel)]
    return sym, ln, gaps, score, col


def trace_jobs(progs: Dict, reads: np.ndarray, wstart: np.ndarray,
               wide: np.ndarray
               ) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                          np.ndarray, np.ndarray]:
    """Fill + in-device traceback for winner jobs. Returns host arrays
    (symbols (J, L+Cmax) uint8 reversed, out_len (J,), gaps (J,),
    score (J,), col (J,)) aligned to the input job order. Symbol rows
    from the narrow program are padded to the wide width."""
    return trace_jobs_fetch(
        progs, trace_jobs_launch(progs, reads, wstart, wide),
        len(wstart), reads.shape[1])
