"""Pair-overlap scan for BBMerge, vectorized over a batch of pairs.

Clone of the reference's mismatch-count overlap kernel (reference:
jgi/BBMergeOverlapper.mateByOverlapJava_unrolled:543-660,
jni/BBMergeOverlapper.c:439): for every candidate overlap length, count
quality-gated good/bad base agreements between read 1's suffix and the
(already reverse-complemented) read 2's prefix, then apply the
margin-based best/ambiguity ladder.

The reference's inner early-exit (stop counting past badlim) only ever
abandons overlaps that lose every later comparison, so full vectorized
counting is decision-equivalent (see the candidate ladder: a partial
count > bestBad fails ``bad<=bestBad`` exactly as the full count does).

The scan itself is one numpy pass per overlap value across all pairs;
decision state (best/ambig/done) advances with vector ops, preserving the
reference's sequential tie semantics.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

PROB_CORRECT = 1.0 - 10.0 ** (-np.arange(128) / 10.0)

RET_AMBIG = -1
RET_NO_SOLUTION = -2


def mate_by_overlap_batch(
        a_bases: np.ndarray, a_qual: Optional[np.ndarray],
        b_bases: np.ndarray, b_qual: Optional[np.ndarray],
        min_overlap0: int = 8, min_overlap: int = 11,
        min_insert0: int = 35, margin: int = 2,
        max_mismatches0: int = 3, max_mismatches: int = 3,
        minq: int = 10) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """a_bases (B, alen), b_bases (B, blen) uint8 ASCII (b already rc'd to
    read-1 orientation); quals phred or None.

    Returns (insert (B,) int32 with -1 for no-merge, bad (B,) int32,
    ambig (B,) bool)."""
    B, alen = a_bases.shape
    blen = b_bases.shape[1]
    min_overlap0 = min(max(1, min_overlap0), min_overlap)
    margin = max(margin, 0)

    if a_qual is not None and b_qual is not None:
        aprob = PROB_CORRECT[np.clip(a_qual, 0, 127)]
        bprob = PROB_CORRECT[np.clip(b_qual, 0, 127)]
    else:
        aprob = np.full((B, alen), 0.98)
        bprob = np.full((B, blen), 0.98)
    minprob = PROB_CORRECT[min(max(1, minq), 41)]

    best_overlap = np.full(B, -1, np.int32)
    best_good = np.full(B, -1, np.int32)
    best_bad = np.full(B, max_mismatches0, np.int32)
    ambig = np.zeros(B, bool)
    done = np.zeros(B, bool)
    early_ret = np.zeros(B, bool)

    max_overlap = alen + blen - max(min_overlap, min_insert0)
    for overlap in range(max(min_overlap0, 0), max_overlap):
        istart = 0 if overlap <= alen else overlap - alen
        jstart = alen - overlap if overlap <= alen else 0
        iters = min(overlap - istart, blen - istart, alen - jstart)
        if iters <= 0:
            continue
        aj = a_bases[:, jstart:jstart + iters]
        bi = b_bases[:, istart:istart + iters]
        pc = aprob[:, jstart:jstart + iters] * bprob[:, istart:istart + iters]
        counted = pc > minprob
        eq = aj == bi
        good = (counted & eq).sum(1).astype(np.int32)
        bad = (counted & ~eq).sum(1).astype(np.int32)

        # decision ladder (reference: :612-646)
        active = ~done
        cand = active & (bad * 2 < good)
        c1 = cand & (good > min_overlap) & (bad <= best_bad)
        winner = c1 & ((bad < best_bad) | ((bad == best_bad)
                                           & (good > best_good)))
        ambig |= winner & (best_bad - bad < margin)
        tie = c1 & ~winner & (bad == best_bad)
        ambig |= tie
        best_overlap = np.where(winner, overlap, best_overlap)
        best_good = np.where(winner, good, best_good)
        best_bad = np.where(winner, bad, best_bad)
        # early return 'f': ambig with bestBad<margin -> result -1
        f = c1 & ambig & (best_bad < margin)
        early_ret |= f
        done |= f
        # branch 'g': weak candidate with few mismatches -> ambiguous
        g = cand & ~(good > min_overlap) & (bad < margin)
        ambig |= g
        early_ret |= g
        done |= g
        if done.all():
            break

    no_sln = (~ambig) & (best_bad > max_mismatches - margin)
    best_overlap = np.where(no_sln | early_ret, -1, best_overlap)
    insert = np.where(best_overlap < 0, -1, alen + blen - best_overlap)
    return insert.astype(np.int32), best_bad, ambig


def join_pairs(a_bases, a_qual, b_bases, b_qual, inserts,
               max_merge_quality: int = 41):
    """Consensus-join each overlapping pair at its insert size
    (reference: stream/Read.joinRead:2744-2850): agreeing bases take
    min(max(q)+min(q)/4, cap); disagreeing take the higher-quality base
    (N on tie) with quality max-min. b is in read-1 orientation.
    Returns list of (bases bytes, qual bytes|None) for inserts>0."""
    out = []
    B, alen = a_bases.shape
    blen = b_bases.shape[1]
    for i in range(B):
        insert = int(inserts[i])
        if insert <= 0:
            out.append(None)
            continue
        bases = np.full(insert, ord("N"), np.uint8)
        n = min(alen, insert)
        bases[:n] = a_bases[i, :n]
        if a_qual is not None:
            quals = np.zeros(insert, np.int16)
            quals[:n] = a_qual[i, :n]
        else:
            quals = None
        # walk b from its end aligned to the join's end
        ii = insert - 1
        j = blen - 1
        while ii >= 0 and j >= 0:
            ca, cb = bases[ii], b_bases[i, j]
            if quals is None:
                if ca == 0 or ca == ord("N"):
                    bases[ii] = cb
                elif ca != cb and cb != ord("N"):
                    bases[ii] = max(ca, cb)
            else:
                qa, qb = int(quals[ii]), int(b_qual[i, j])
                if ca == 0 or ca == ord("N"):
                    bases[ii] = cb
                    quals[ii] = qb
                elif cb == 0 or cb == ord("N"):
                    pass
                elif ca == cb:
                    quals[ii] = min(max(qa, qb) + min(qa, qb) // 4,
                                    max_merge_quality)
                else:
                    bases[ii] = ca if qa > qb else (cb if qa < qb
                                                    else ord("N"))
                    quals[ii] = max(qa, qb) - min(qa, qb)
            ii -= 1
            j -= 1
        q = None
        if quals is not None:
            q = bytes(np.clip(quals, 0, 127).astype(np.uint8) + 33)
        out.append((bytes(bases), q))
    return out
