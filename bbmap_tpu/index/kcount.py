"""Probabilistic k-mer counter (counting Bloom filter / count-min sketch).

reference: bloom/KCountArray.java + KCountArray7MTA.java:27 — atomic
packed-cell counting Bloom filter with multiple hashes and optional
prefilter. Here: flat numpy cell arrays with vectorized multi-hash
scatter-add (np.add.at) — the same HBM-resident layout a device
scatter-add kernel uses (SURVEY.md §2.7 'TPU equivalent: HBM-resident
packed counter arrays with vectorized multi-hash scatter-add').

Counts are capped at cell_max on read (count-min over the hash functions),
matching the reference's saturating packed cells.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

_MASKS = [
    0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
    0x27D4EB2F165667C5, 0xFF51AFD7ED558CCD, 0xC4CEB9FE1A85EC53,
]


def _mix(x: np.ndarray, salt: int) -> np.ndarray:
    """64-bit mix (splitmix-style) for hashing kmers to cells."""
    x = (x.astype(np.uint64) * np.uint64(salt)) & np.uint64(2**64 - 1)
    x ^= x >> np.uint64(33)
    x = (x * np.uint64(0xFF51AFD7ED558CCD)) & np.uint64(2**64 - 1)
    x ^= x >> np.uint64(29)
    return x


class KCountArray:
    def __init__(self, cells: int, cell_bits: int = 16, hashes: int = 1):
        assert cell_bits in (2, 4, 8, 16, 32)
        self.cells = 1 << int(cells).bit_length() if cells & (cells - 1) \
            else cells
        self.mask = self.cells - 1
        self.cell_bits = cell_bits
        self.cell_max = (1 << cell_bits) - 1
        self.hashes = hashes
        dtype = (np.uint8 if cell_bits <= 8 else
                 np.uint16 if cell_bits == 16 else np.uint32)
        self.array = np.zeros((hashes, self.cells), dtype)
        self._acc_dtype = np.uint32

    def _idx(self, kmers: np.ndarray, h: int) -> np.ndarray:
        return (_mix(kmers, _MASKS[h % len(_MASKS)])
                & np.uint64(self.mask)).astype(np.int64)

    def increment(self, kmers: np.ndarray) -> None:
        """Vectorized multi-hash scatter-add with saturation."""
        for h in range(self.hashes):
            idx = self._idx(kmers, h)
            row = self.array[h]
            # saturating add: accumulate deltas in a wide dtype first
            deltas = np.bincount(idx, minlength=self.cells)
            nz = np.nonzero(deltas)[0]
            cur = row[nz].astype(np.int64)
            row[nz] = np.minimum(cur + deltas[nz],
                                 self.cell_max).astype(row.dtype)

    def read(self, kmers: np.ndarray) -> np.ndarray:
        """count-min over hash functions."""
        out = None
        for h in range(self.hashes):
            v = self.array[h][self._idx(kmers, h)].astype(np.int32)
            out = v if out is None else np.minimum(out, v)
        return out if out is not None else np.zeros(len(kmers), np.int32)

    def used_fraction(self) -> float:
        return float((self.array[0] != 0).mean())
