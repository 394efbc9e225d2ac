"""Seeding: key offsets, key lookup, site gathering, and diagonal chaining.

Candidate-site generation replacing the reference's heap-merge walk
(reference: align2/BBIndex.java find:403 / slowWalk2:855 and
align2/KeyRing.java). Instead of a k-way heap merge of sorted per-key site
lists, all (site - offset) diagonals are collected and sorted, and runs
within ±chain window become candidate sites with vote counts — same
candidate set, array-friendly construction.

Round-1 notes:
- offsets use the density ladder of quickMap (reference:
  align2/AbstractMapThread.java:663-676) with even spacing
  (KeyRing.makeOffsetsWithNumberOfKeys); the quality-probability offset
  shifting of makeOffsets3 is not yet reproduced.
- chaining window is capped (reference chains to ±MAX_INDEL=16000 with
  gap-compressed DP; long-indel gap compression lands with the PacBio
  stack).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from ..core.bases import BASE_TO_NUMBER
from ..index.build import KmerIndex, reverse_complement_key

# reference defaults (align2/BBMap.java:44-63)
KEY_DENSITY = 1.9
MAX_KEY_DENSITY = 3.0
MIN_KEY_DENSITY = 1.5
MAX_DESIRED_KEYS = 15


def desired_keys_from_density(readlen: int, k: int, density: float,
                              min_keys: int) -> int:
    """reference: align2/KeyRing.desiredKeysFromDensity:271-283."""
    slots = readlen - k + 1
    desired = int(np.ceil((readlen * density) / k))
    desired = max(min_keys, desired)
    return min(slots, desired)


def make_offsets_with_number_of_keys(readlen: int, k: int,
                                     max_keys: int) -> Optional[np.ndarray]:
    """reference: align2/KeyRing.makeOffsetsWithNumberOfKeys:186-246."""
    if k > readlen:
        return None
    slots = readlen - k + 1
    if slots == 1 or max_keys == 1:
        return np.array([slots // 2], np.int32)
    if slots == 2 or max_keys == 2:
        return np.array([0, slots - 1], np.int32)
    if slots == 3 or max_keys == 3:
        return np.array([0, slots // 2, slots - 1], np.int32)
    midslots = slots - 2
    max_keys = min(max_keys, slots)
    middles = min(max_keys - 2, midslots)
    fspacing = max(1.0, midslots / np.float32(middles + 1.0))
    offsets = np.zeros(middles + 2, np.int32)
    offsets[-1] = slots - 1
    for i in range(1, middles + 1):
        # Java Math.round on float
        offsets[i] = int(np.floor(np.float32(fspacing) * i + 0.5))
    if middles > 2:
        offsets[1] = int(fspacing)
        offsets[middles] = int(np.ceil(fspacing * middles))
    return offsets


def key_density_ladder(readlen: int, k: int) -> Tuple[float, float]:
    """(keyDen2, keyDen3) — reference:
    align2/AbstractMapThread.java:663-676."""
    key_den2 = (MAX_DESIRED_KEYS * k) / float(readlen)
    key_den2 = max(MIN_KEY_DENSITY, key_den2)
    key_den2 = min(KEY_DENSITY, key_den2, float(k))
    if readlen <= 50:
        key_den3 = MAX_KEY_DENSITY
    elif readlen >= 200:
        key_den3 = MAX_KEY_DENSITY - 0.5
    else:
        key_den3 = MAX_KEY_DENSITY - 0.003333333333 * (readlen - 50)
    key_den3 = max(KEY_DENSITY, key_den3)
    key_den3 = min(float(k), key_den3)
    return key_den2, key_den3


def make_offsets(readlen: int, k: int) -> Optional[np.ndarray]:
    key_den2, _ = key_density_ladder(readlen, k)
    desired = desired_keys_from_density(readlen, k, key_den2, 2)
    return make_offsets_with_number_of_keys(readlen, k, desired)


def keys_at_offsets(bases_row: np.ndarray, offsets: np.ndarray,
                    k: int) -> np.ndarray:
    """2-bit big-endian keys at each offset; -1 where a key spans an
    undefined base (reference: ChromosomeArray.toNumber)."""
    keys = np.zeros(len(offsets), np.int64)
    bad = np.zeros(len(offsets), bool)
    for j in range(k):
        c = BASE_TO_NUMBER[bases_row[offsets + j]].astype(np.int64)
        bad |= c < 0
        keys = (keys << 2) | (c & 3)
    keys[bad] = -1
    return keys


@dataclass
class Candidate:
    """A chained candidate site (the reference's SiteScore skeleton,
    stream/SiteScore.java:21)."""
    read_idx: int
    strand: int         # 0 plus, 1 minus
    start: int          # flat genome position of expected read base 0
    stop: int           # flat genome position of expected read end
    votes: int          # approx hit count (quickScore proxy)
    spread: int         # diagonal spread within the chain (indel extent)


def gather_candidates(index: KmerIndex, offsets: np.ndarray,
                      keys_p: np.ndarray, read_len: int, read_idx: int,
                      chain_dist: int = 400,
                      max_list_length: Optional[int] = None,
                      max_candidates: int = 16) -> List[Candidate]:
    """Chain index hits on both strands for one read.

    Minus-strand handling per the reference: look up the rc of each key;
    a minus hit at site s with key offset o corresponds to the rc-read
    starting at s - (read_len - (o + k)) (reference:
    align2/KeyRing.reverseOffsets:125-137).
    """
    k = index.k
    if max_list_length is None:
        max_list_length = index.max_usable_length
    cands: List[Candidate] = []
    starts = index.starts
    sites = index.sites
    for strand in (0, 1):
        if strand == 0:
            kk = keys_p
            off_adj = offsets
        else:
            kk = reverse_complement_key(keys_p, k)
            off_adj = read_len - (offsets + k)  # rc-read offset of same key
        diags = []
        votes_w = []
        for i in range(len(kk)):
            key = int(kk[i])
            if key < 0:
                continue
            s0, s1 = starts[key], starts[key + 1]
            n = s1 - s0
            if n == 0 or n > max_list_length:
                continue
            site_list = sites[s0:s1]
            diags.append(site_list.astype(np.int64) - int(off_adj[i]))
            votes_w.append(np.full(n, i, np.int32))
        if not diags:
            continue
        dall = np.concatenate(diags)
        kidx = np.concatenate(votes_w)
        order = np.argsort(dall, kind="stable")
        dall = dall[order]
        kidx = kidx[order]
        # split chains where consecutive diagonals differ by > chain_dist
        breaks = np.nonzero(np.diff(dall) > chain_dist)[0]
        seg_starts = np.concatenate([[0], breaks + 1])
        seg_ends = np.concatenate([breaks + 1, [len(dall)]])
        for a, b in zip(seg_starts, seg_ends):
            seg_d = dall[a:b]
            votes = len(np.unique(kidx[a:b]))
            start = int(seg_d[0])
            spread = int(seg_d[-1] - seg_d[0])
            cands.append(Candidate(
                read_idx=read_idx, strand=strand, start=start,
                stop=int(seg_d[-1]) + read_len - 1, votes=votes,
                spread=spread))
    cands.sort(key=lambda c: (-c.votes, c.strand, c.start))
    return cands[:max_candidates]
