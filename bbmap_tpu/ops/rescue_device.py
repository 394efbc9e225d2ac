"""Device mate-rescue kernel: the brute-force windowed scan of
AbstractMapThread.quickRescue (reference:
align2/AbstractMapThread.java:2303-2404), batched over a fixed job
budget as ONE jitted program.

Per job: scan every candidate start in [lo, hi] (a window around the
anchor mate), counting mismatches and the longest exact-match run
("contig"), score = (L - mism) + contig, then apply the reference's
ORDER-DEPENDENT acceptance walk — monotonically tightening mismatch
bound, (score, absdif-to-ideal) lexicographic improvement, and the
exact-match bound shrink — exactly as the host oracle
``pipeline._quick_rescue``. The per-offset statistics accumulate in a
lax.scan over read positions (vector state (R, N_OFF)); the acceptance
walk is a second lax.scan over scan positions with per-job scalar state
— both directions handled by pre-flipping the per-offset arrays so the
walk always runs ascending.

Parity: tests/test_rescue_device.py asserts bit-equal (best_start,
mismatches) against the host oracle across directions, bounds, and N
bases.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..align.quickmap_device import (I32, device_arrays,
                                     extract_ref_codes)

BIGA = np.int32(2 ** 30)


def _rescue_stage(gpack_d, nmask_d, G: int, has_n: bool, reads, rn,
                  lo, n, ideal_k, right, max_mm, Lm: int, N_OFF: int):
    """reads: (R, Lm) codes 0..4 (already mate-oriented). lo: (R,) flat
    window start. n: (R,) number of candidate offsets (<= N_OFF).
    ideal_k: (R,) scan-coordinate of the ideal start. right: (R,) bool
    scan direction (True = ascending starts). Returns (best_k, min_mm,
    mism_at_best) — best_k < 0 when nothing accepted."""
    R = reads.shape[0]
    W = N_OFF + Lm
    g, gn = extract_ref_codes(gpack_d, nmask_d, lo, W, G, has_n=has_n)
    # per-offset statistics: scan over read positions j
    gbad = gn  # (R, W)

    def stat_step(carry, j):
        mism, cur, best = carry
        gs = jax.lax.dynamic_slice_in_dim(g, j, N_OFF, axis=1)
        gb = jax.lax.dynamic_slice_in_dim(gbad, j, N_OFF, axis=1)
        rj = jax.lax.dynamic_slice_in_dim(reads, j, 1, axis=1)
        rb = jax.lax.dynamic_slice_in_dim(rn, j, 1, axis=1)
        good = (gs == rj) & ~gb & ~rb
        mism = mism + (~good).astype(jnp.int16)
        cur = jnp.where(good, cur + jnp.int16(1), jnp.int16(0))
        best = jnp.maximum(best, cur)
        return (mism, cur, best), None

    z = jnp.zeros((R, N_OFF), jnp.int16)
    (mism, _cur, contig), _ = jax.lax.scan(
        stat_step, (z, z, z), jnp.arange(Lm), unroll=8)
    mism = mism.astype(I32)
    score = (Lm - mism) + contig.astype(I32)          # (R, N_OFF)

    # flip so the acceptance walk always ascends scan coordinate k:
    # start(k) = lo + k when right, hi - k otherwise
    def orient(a):
        return jnp.where(right[:, None], a, a[:, ::-1])

    # scan coordinate k always ascends; offset t = k when right (start =
    # lo + t ascending) and t = n-1-k otherwise (start descending), so
    # one walk handles both directions
    k_ar = jnp.arange(N_OFF, dtype=I32)[None, :]
    t_of_k = jnp.where(right[:, None], k_ar, (n[:, None] - 1) - k_ar)
    t_valid = (t_of_k >= 0) & (t_of_k < n[:, None])
    t_safe = jnp.clip(t_of_k, 0, N_OFF - 1)
    take = lambda a: jnp.take_along_axis(a, t_safe, axis=1)
    mism_k = take(mism)
    score_k = take(score)
    absdif_k = jnp.abs(t_of_k - ideal_k[:, None])

    # bound-shrink reference point in k-space: on accepting an exact
    # match at absdif a the remaining scan is limited to k <= kref + a
    # (right: start <= ideal+a; left: start >= ideal-a)
    kref = jnp.where(right, ideal_k, (n - 1) - ideal_k)

    def walk_step(carry, xs):
        min_mm, best_s, best_a, best_k, klim = carry
        m, s, a, valid, k = xs
        ok = valid & (k <= klim) & (m <= min_mm) \
            & ((s > best_s) | ((s == best_s) & (a < best_a)))
        min_mm = jnp.where(ok, m, min_mm)
        best_s = jnp.where(ok, s, best_s)
        best_a = jnp.where(ok, a, best_a)
        best_k = jnp.where(ok, k, best_k)
        klim = jnp.where(ok & (m == 0),
                         jnp.minimum(klim, kref + a), klim)
        return (min_mm, best_s, best_a, best_k, klim), None

    init = (max_mm + 1, jnp.zeros(R, I32),
            jnp.full(R, BIGA, I32), jnp.full(R, -1, I32),
            jnp.full(R, N_OFF, I32))
    xs = (mism_k.T, score_k.T, absdif_k.T, t_valid.T,
          jnp.broadcast_to(k_ar.reshape(N_OFF, 1), (N_OFF, R)))
    (min_mm, _bs, _ba, best_k, _kl), _ = jax.lax.scan(
        walk_step, init, xs, unroll=8)
    return best_k, min_mm


def build_rescue(index, Lm: int, R: int, N_OFF: int = 1536):
    """Returns rescue(reads, lo, n, ideal_k, right, max_mm) ->
    (best_k (R,), min_mm (R,)) for a fixed job budget R. ``reads`` are
    mate-oriented 2-bit codes (4 = N); callers convert best_k back to a
    flat genome start (lo + best_k when right, lo + n-1 - best_k
    otherwise)."""
    starts_d, sites_d, gpack_d, nmask_d, G = device_arrays(index)
    has_n = getattr(index, "_has_n", None)
    if has_n is None:
        has_n = bool(np.any(index.genome_codes > 3))
        index._has_n = has_n

    def prog(reads, rn, lo, n, ideal_k, right, max_mm, gpack_d,
             nmask_d):
        return _rescue_stage(gpack_d, nmask_d, G, has_n, reads, rn, lo,
                             n, ideal_k, right, max_mm, Lm, N_OFF)

    jitted = jax.jit(prog)

    def dispatch(reads_codes: np.ndarray, lo: np.ndarray, n: np.ndarray,
                 ideal_k: np.ndarray, right: np.ndarray,
                 max_mm: np.ndarray):
        """Launch and return the in-flight device outputs (host copies
        started); fetch with np.asarray when needed."""
        rn = reads_codes > 3
        out = jitted(jnp.asarray(reads_codes), jnp.asarray(rn),
                     jnp.asarray(lo.astype(np.int32)),
                     jnp.asarray(n.astype(np.int32)),
                     jnp.asarray(ideal_k.astype(np.int32)),
                     jnp.asarray(right),
                     jnp.asarray(max_mm.astype(np.int32)),
                     gpack_d, nmask_d)
        for o in out:
            try:
                o.copy_to_host_async()
            except Exception:
                pass
        return out

    def run(reads_codes, lo, n, ideal_k, right, max_mm):
        out = dispatch(reads_codes, lo, n, ideal_k, right, max_mm)
        return np.asarray(out[0]), np.asarray(out[1])

    run.dispatch = dispatch
    run.N_OFF = N_OFF
    run.R = R
    return run
