"""On-hardware Pallas MSA parity selftest (VERDICT r2 next-step #7).

The CPU test suite exercises the Pallas kernels only in interpret mode;
Mosaic lowering differences (the VMEM ring rolls, lane packing) would
otherwise surface as silent mis-mapping. This ~30 s check runs the REAL
compiled kernels on whatever backend is active and asserts score/column
parity against the numpy oracle (ops/msa_ref — itself pinned to the
committed golden transcription vectors, tests/golden/). bench.py runs
it before the full-batch phase and flips to the XLA DP fallback with a
warning when it fails.
"""

from __future__ import annotations

import numpy as np


def _cases(rng, n, R: int, C: int):
    """n (read, ref_window) pairs with subs and small indels."""
    bases = np.frombuffer(b"ACGT", np.uint8)
    reads = np.zeros((n, R), np.uint8)
    refs = np.zeros((n, C), np.uint8)
    for i in range(n):
        ref = rng.choice(bases, size=C).astype(np.uint8)
        at = int(rng.integers(4, C - R - 12))
        read = ref[at:at + R].copy()
        kind = i % 4
        if kind == 1:
            for _ in range(int(rng.integers(1, 4))):
                p = int(rng.integers(0, R))
                read[p] = bases[int(rng.integers(0, 4))]
        elif kind == 2:        # deletion in read (ref has extra bases)
            d = int(rng.integers(1, 6))
            p = int(rng.integers(5, R - 5))
            w = ref[at:at + R + d]
            read = np.concatenate([w[:p], w[p + d:p + d + (R - p)]])
        elif kind == 3:        # insertion in read
            d = int(rng.integers(1, 6))
            p = int(rng.integers(5, R - 5))
            ins = bases[rng.integers(0, 4, size=d)]
            read = np.concatenate([read[:p], ins, read[p:R - d]])
        reads[i] = read[:R]
        refs[i] = ref
    return reads, refs


def pallas_selftest(profiles=("short", "pacbio"), n: int = 128,
                    R: int = 64, C: int = 128,
                    verbose=print) -> bool:
    """True iff the compiled Pallas score and fill kernels reproduce
    the numpy oracle on random short-read-shaped cases for every
    requested scoring profile."""
    import jax

    from ..core.constants import PACBIO_PROFILE, SHORT_PROFILE
    from . import msa_pallas, msa_ref

    # jobs ride the lane axis: hardware blocks must be multiples of 128
    bb = 128 if jax.default_backend() != "cpu" else n
    assert n % bb == 0, (n, bb)
    rng = np.random.default_rng(20260820)
    ok = True
    for pname in profiles:
        P = SHORT_PROFILE if pname == "short" else PACBIO_PROFILE
        reads, refs = _cases(rng, n, R, C)

        # oracle
        want_score = np.zeros(n, np.int64)
        want_col = np.zeros(n, np.int64)
        for i in range(n):
            packed, (rows, max_col, max_state, max_score) = \
                msa_ref.fill_unlimited(reads[i], refs[i], P)
            want_score[i] = max_score
            want_col[i] = max_col

        rows = np.full(n, R, np.int32)
        r1, r0, rp, rw = msa_pallas.prep_operands_t_device(
            reads, refs, rows, R, C)
        got_s = np.asarray(msa_pallas.msa_score_pallas_t(
            r1, r0, rp, rw, R, C, bb, P))
        out3, _prevs = msa_pallas.msa_fill_pallas_t(
            r1, r0, rp, rw, R, C, bb, P)
        out3 = np.asarray(out3)
        for name, got, want in (
                (f"{pname}/score-kernel score", got_s[0], want_score),
                (f"{pname}/fill-kernel score", out3[0], want_score),
                (f"{pname}/fill-kernel col", out3[1], want_col)):
            bad = np.nonzero(got.astype(np.int64) != want)[0]
            if len(bad):
                ok = False
                i = int(bad[0])
                verbose(f"PALLAS SELFTEST MISMATCH {name}: "
                        f"{len(bad)}/{n} cases differ; case {i}: "
                        f"got {got[i]} want {want[i]}")
    return ok
