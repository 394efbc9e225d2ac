"""Device (TPU) k-mer set scan for BBDuk/BBDuk2/Seal — the rolling
lookup hot loop of the reference run as ONE jitted XLA program per read
batch (reference: jgi/BBDukF.java ProcessThread per-base rolling lookup;
SURVEY §3.3 hot loop; VERDICT r2 missing #1).

Design: the sorted-value set (index/kmerset.py) is already the layout a
TPU wants — membership is a vectorized branchless binary search. int64
values are carried as (hi, lo) uint32 pairs (no jax_enable_x64), and a
radix bucket table over the value's top bits narrows each search to a
handful of probe rounds:

1. rolling (hi, lo) 2-bit k-mers of every read position via k shifted
   slices (no gathers)
2. canonicalization (max(kmer, rc)), middle-base mask, length-mask bit —
   bit-for-bit the host ``KmerSet.to_values`` / reference
   ``jgi/BBDukF.toValue``
3. bucket = top bits -> [start, end) slice of the sorted array
   (host-precomputed prefix table)
4. T rounds of branchless lower-bound (T = ceil(log2(max bucket len)),
   typically 3-6) — each round is one lane-aligned gather pair
5. final equality probe -> per-position scaffold ids ((B, m) int32, -1
   for miss), identical to the host ``scan_batch``

The host numpy path remains the reference implementation; parity is
asserted in tests/test_bbduk_device.py on adapter corpora and random
batches.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

from .kmerset import KmerSet, length_mask, middle_mask

I32 = None  # populated lazily with jnp dtypes (keep module import cheap)


def _jnp():
    import jax
    import jax.numpy as jnp
    return jax, jnp


def _rev2_32(x):
    """Reverse the 16 2-bit groups of each uint32 lane."""
    _, jnp = _jnp()
    x = ((x & jnp.uint32(0x33333333)) << 2) | \
        ((x >> 2) & jnp.uint32(0x33333333))
    x = ((x & jnp.uint32(0x0F0F0F0F)) << 4) | \
        ((x >> 4) & jnp.uint32(0x0F0F0F0F))
    x = ((x & jnp.uint32(0x00FF00FF)) << 8) | \
        ((x >> 8) & jnp.uint32(0x00FF00FF))
    x = ((x & jnp.uint32(0x0000FFFF)) << 16) | (x >> 16)
    return x


def _shr_pair(hi, lo, s: int):
    """Logical right shift of a (hi, lo) uint32 pair by static s."""
    _, jnp = _jnp()
    if s == 0:
        return hi, lo
    if s < 32:
        lo2 = (lo >> s) | (hi << (32 - s))
        hi2 = hi >> s
        return hi2, lo2
    if s == 32:
        return jnp.zeros_like(hi), hi
    return jnp.zeros_like(hi), hi >> (s - 32)


def _rc_pair(hi, lo, k: int):
    """Reverse complement of a 2k-bit k-mer held in (hi, lo)."""
    _, jnp = _jnp()
    nhi = ~hi
    nlo = ~lo
    rhi = _rev2_32(nlo)
    rlo = _rev2_32(nhi)
    return _shr_pair(rhi, rlo, 64 - 2 * k)


def _lt_pair(h1, l1, h2, l2):
    return (h1 < h2) | ((h1 == h2) & (l1 < l2))


class DeviceKmerSet:
    """Device-resident mirror of a host KmerSet for one k-mer length."""

    N_BUCKET_BITS = 16

    def __init__(self, ks: KmerSet):
        import jax
        self.k = ks.k
        self.rcomp = ks.rcomp
        self.mask_middle = ks.mask_middle
        self.n = len(ks.values)
        v = ks.values.astype(np.uint64)
        self.hi_np = (v >> np.uint64(32)).astype(np.uint32)
        self.lo_np = (v & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        self.hi = jax.device_put(self.hi_np)
        self.lo = jax.device_put(self.lo_np)
        self.ids = jax.device_put(ks.ids.astype(np.int32))
        # radix bucket table over the top bits: values fit in
        # 2k+1 bits (length-mask bit 2k is the highest set bit for
        # uniform-k sets; mixed mink lengths only lower it)
        bits = 2 * ks.k + 1
        NB = min(self.N_BUCKET_BITS, bits)
        self.shift = max(0, bits - NB)
        bkt = (v >> np.uint64(self.shift)).astype(np.int64)
        nb = 1 << NB
        starts = np.searchsorted(bkt, np.arange(nb + 1), side="left")
        self.starts = jax.device_put(starts.astype(np.int32))
        maxlen = int(np.max(np.diff(starts))) if self.n else 0
        self.t_rounds = max(1, int(np.ceil(np.log2(maxlen + 1)))) \
            if maxlen else 1
        self._scan_cache = {}

    # -- device program ---------------------------------------------------

    def _values_pair(self, codes, m: int):
        """(B, L) 2-bit codes -> ((B, m) hi, lo canonical values,
        valid mask). Mirrors KmerSet.to_values + rolling_kmers_batch."""
        jax, jnp = _jnp()
        k = self.k
        U32 = jnp.uint32
        B = codes.shape[0]
        hi = jnp.zeros((B, m), U32)
        lo = jnp.zeros((B, m), U32)
        bad = jnp.zeros((B, m), bool)
        ci = codes.astype(jnp.int32)
        for j in range(k):
            c = ci[:, j:m + j]
            bad = bad | (c > 3)
            cc = jnp.where(c > 3, 0, c).astype(U32)
            hi = (hi << 2) | (lo >> 30)
            lo = (lo << 2) | cc
        if self.rcomp:
            rhi, rlo = _rc_pair(hi, lo, k)
            use_rc = _lt_pair(hi, lo, rhi, rlo)
            hi = jnp.where(use_rc, rhi, hi)
            lo = jnp.where(use_rc, rlo, lo)
        mm = middle_mask(k, self.mask_middle)
        if mm != -1:
            # middle-base bits are below bit 32 for every k <= 31
            lo = lo & U32(np.uint32(mm & 0xFFFFFFFF))
            hi = hi & U32(np.uint32((mm >> 32) & 0xFFFFFFFF))
        lm = length_mask(k)
        if lm < (1 << 32):
            lo = lo | U32(lm)
        else:
            hi = hi | U32(lm >> 32)
        return hi, lo, ~bad

    def _scan_program(self, codes, s_hi, s_lo, s_ids, s_starts):
        """(B, L) codes -> (B, m) int32 ids (-1 miss). The set arrays
        arrive as jit ARGUMENTS — the remote compile service rejects
        programs with big inlined constants (HTTP 413), so nothing
        device-resident may be closed over."""
        jax, jnp = _jnp()
        from ..align.quickmap_device import take_flat
        I = jnp.int32
        U32 = jnp.uint32
        B, L = codes.shape
        m = L - self.k + 1
        qhi, qlo, valid = self._values_pair(codes, m)
        # miss sentinel for invalid windows: all-ones never matches a
        # real value (bit 63 is never set: values < 2^63)
        qhi = jnp.where(valid, qhi, U32(0xFFFFFFFF))
        qlo = jnp.where(valid, qlo, U32(0xFFFFFFFF))

        # bucket -> [base, end)
        s = self.shift
        if s >= 32:
            bkt = (qhi >> (s - 32)).astype(I)
        elif s > 0:
            bkt = (((qhi << (32 - s)) | (qlo >> s))
                   & U32((1 << (2 * self.k + 1 - s)) - 1)).astype(I)
        else:
            bkt = qlo.astype(I)
        bkt = jnp.clip(bkt, 0, s_starts.shape[0] - 2)
        base = take_flat(s_starts, bkt)
        end = take_flat(s_starts, bkt + 1)
        sz = end - base

        # branchless lower_bound within the bucket
        for _ in range(self.t_rounds):
            half = sz >> 1
            mid = base + half
            midc = jnp.clip(mid, 0, max(self.n - 1, 0))
            vh = take_flat(s_hi, midc)
            vl = take_flat(s_lo, midc)
            go_right = _lt_pair(vh, vl, qhi, qlo) & (sz > 0)
            base = jnp.where(go_right, mid + 1, base)
            sz = jnp.where(go_right, sz - half - 1, half)

        pos = jnp.clip(base, 0, max(self.n - 1, 0))
        fh = take_flat(s_hi, pos)
        fl = take_flat(s_lo, pos)
        hit = (fh == qhi) & (fl == qlo) & (base < self.n)
        ids = jnp.where(hit, take_flat(s_ids, pos), -1).astype(I)
        return ids

    def scan_ids(self, bases: np.ndarray) -> np.ndarray:
        """Host entry: (B, L) ASCII -> (B, m) int32 ids, -1 for miss."""
        jax, jnp = _jnp()
        from ..align.quickmap_device import ascii_to_codes
        B, L = bases.shape
        key = (B, L)
        prog = self._scan_cache.get(key)
        if prog is None:
            def f(b, s_hi, s_lo, s_ids, s_starts):
                return self._scan_program(ascii_to_codes(b), s_hi,
                                          s_lo, s_ids, s_starts)
            prog = jax.jit(f)
            self._scan_cache[key] = prog
        return np.asarray(prog(np.ascontiguousarray(bases), self.hi,
                               self.lo, self.ids, self.starts))


def _enabled() -> bool:
    env = os.environ.get("BBMAP_DEVICE_KMERS")
    if env is not None:
        return env.strip().lower() not in ("0", "false", "f", "no",
                                           "off", "")
    import jax
    return jax.default_backend() != "cpu"


def device_scan_batch(ks: KmerSet, bases: np.ndarray
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Device twin of kmerset.scan_batch: (hits, ids) per full-length
    k-mer position. Falls back to None when disabled/too small (caller
    uses the host path)."""
    B, L = bases.shape
    m = L - ks.k + 1
    if m <= 0 or len(ks.values) == 0 or not _enabled():
        return None
    if B * m < 2048:       # dispatch latency beats tiny batches
        return None
    dks = getattr(ks, "_device_set", None)
    if dks is None:
        dks = DeviceKmerSet(ks)
        ks._device_set = dks
    ids = dks.scan_ids(bases)
    return (ids >= 0), ids
