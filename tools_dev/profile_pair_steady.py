"""Clean steady-state decomposition of the paired mapping loop at the
bench shape: full warmup first, then serial per-stage timing (no
concurrent threads), then pipelined wall time for comparison.

Run on the real chip: python tools_dev/profile_pair_steady.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bbmap_tpu.utils.jaxcfg import enable_compilation_cache

enable_compilation_cache()

from bench import make_genome, make_pairs
from bbmap_tpu.core.batch import ReadBatch
from bbmap_tpu.core.genome import Genome, Scaffold
from bbmap_tpu.index.build import analyze_index, build_index
from bbmap_tpu.align.pipeline import BBMapAligner


def log(m):
    print(f"[{time.time()-T0:6.1f}s] {m}", file=sys.stderr, flush=True)


T0 = time.time()


def main():
    n_pairs = int(os.environ.get("PROF_PAIRS", 32768))
    L = 150
    gbases = make_genome()
    g = Genome(chroms=[gbases], scaffolds=[
        Scaffold(chrom=1, sid=1, start=0, length=len(gbases),
                 name="ecoli_like")]).finalize()
    index = build_index(g, 13)
    analyze_index(index, 0.01)
    aligner = BBMapAligner(g, index)
    log("setup done")

    n_batches = 13
    with_q = os.environ.get("PROF_QUALITY", "1") != "0"
    r1, r2, q1, q2, t1, t2 = make_pairs(
        gbases, n_pairs * n_batches, L=L, seed=77,
        with_quality=with_q)

    def mk(rows, quals, b):
        lo = b * n_pairs
        return ReadBatch(
            bases=rows[lo:lo + n_pairs],
            quality=None if quals is None else quals[lo:lo + n_pairs],
            lengths=np.full(n_pairs, L, np.int32),
            ids=[str(i) for i in range(lo, lo + n_pairs)],
            numeric_ids=np.arange(lo, lo + n_pairs, dtype=np.int64))

    # full warmup
    aligner.map_pairs_columnar(mk(r1, q1, 0), mk(r2, q2, 0))
    log("warm")

    # serial per-stage timing, 3 reps, min
    stages = {}
    for rep in range(3):
        b1x, b2x = mk(r1, q1, 1 + rep % 3), mk(r2, q2, 1 + rep % 3)
        ts = time.time()
        f = aligner._fused_pair_dispatch(b1x, b2x, L)
        d_disp = time.time() - ts
        ts = time.time()
        dd = f.host()
        d_dev = time.time() - ts
        ts = time.time()
        mid = aligner._pair_phase1(b1x, b2x, L, dd)
        d_p1 = time.time() - ts
        ts = time.time()
        aligner._pair_phase2(mid)
        d_p2 = time.time() - ts
        for k, v in (("dispatch", d_disp), ("device+link", d_dev),
                     ("phase1_host", d_p1), ("phase2_rescue", d_p2)):
            stages[k] = min(stages.get(k, 1e9), v)
        log(f"rep {rep}: dispatch {d_disp*1e3:.0f} dev {d_dev*1e3:.0f}"
            f" p1 {d_p1*1e3:.0f} p2 {d_p2*1e3:.0f} ms")
    tot = sum(stages.values())
    log("serial stage mins: " + "  ".join(
        f"{k}={v*1e3:.0f}ms" for k, v in stages.items())
        + f"  total={tot*1e3:.0f}ms")

    # pipelined wall
    for rnd in range(2):
        t0 = time.time()
        out = list(aligner.map_pairs_columnar_stream(
            (mk(r1, q1, b), mk(r2, q2, b)) for b in range(1, 13)))
        dt = time.time() - t0
        log(f"pipelined: {dt*1e3:.0f} ms / 12 batches = "
            f"{dt*1000/12:.0f} ms/batch -> "
            f"{2*12*n_pairs/dt:.0f} reads/s")


if __name__ == "__main__" and not os.environ.get("LINK_PROBE"):
    main()


def link_probe():
    """Separate experiment: does a host fetch overlap device compute?
    dispatch A; sleep (A finishes); fetch A  -> pure transfer time.
    dispatch A; dispatch B; fetch A          -> queueing behavior."""
    import time as _t
    n_pairs = int(os.environ.get("PROF_PAIRS", 32768))
    L = 150
    gbases = make_genome()
    g = Genome(chroms=[gbases], scaffolds=[
        Scaffold(chrom=1, sid=1, start=0, length=len(gbases),
                 name="ecoli_like")]).finalize()
    index = build_index(g, 13)
    analyze_index(index, 0.01)
    aligner = BBMapAligner(g, index)
    r1, r2, q1, q2, t1, t2 = make_pairs(gbases, n_pairs * 3, L=L,
                                        seed=78)

    def mk(rows, quals, b):
        lo = b * n_pairs
        return ReadBatch(
            bases=rows[lo:lo + n_pairs],
            quality=None if quals is None else quals[lo:lo + n_pairs],
            lengths=np.full(n_pairs, L, np.int32),
            ids=[str(i) for i in range(lo, lo + n_pairs)],
            numeric_ids=np.arange(lo, lo + n_pairs, dtype=np.int64))

    aligner.map_pairs_columnar(mk(r1, q1, 0), mk(r2, q2, 0))
    log("warm")
    for trial in range(2):
        f = aligner._fused_pair_dispatch(mk(r1, q1, 1), mk(r2, q2, 1),
                                         L)
        _t.sleep(2.0)                      # A finishes on device
        t0 = _t.time()
        f.host()
        log(f"fetch after idle: {1e3*(_t.time()-t0):.0f} ms")
    for trial in range(2):
        fA = aligner._fused_pair_dispatch(mk(r1, q1, 1),
                                          mk(r2, q2, 1), L)
        fB = aligner._fused_pair_dispatch(mk(r1, q1, 2),
                                          mk(r2, q2, 2), L)
        t0 = _t.time()
        fA.host()
        tA = _t.time() - t0
        t0 = _t.time()
        fB.host()
        tB = _t.time() - t0
        log(f"fetch A with B queued: {1e3*tA:.0f} ms; "
            f"then fetch B: {1e3*tB:.0f} ms")
    for trial in range(2):
        # does A's output copy stream WHILE B computes?
        fA = aligner._fused_pair_dispatch(mk(r1, q1, 1),
                                          mk(r2, q2, 1), L)
        fB = aligner._fused_pair_dispatch(mk(r1, q1, 2),
                                          mk(r2, q2, 2), L)
        _t.sleep(0.65)          # A done (~425ms); B mid-flight
        t0 = _t.time()
        fA.host()
        tA = _t.time() - t0
        t0 = _t.time()
        fB.host()
        tB = _t.time() - t0
        log(f"fetch A at t=650ms (B mid-flight): {1e3*tA:.0f} ms; "
            f"then fetch B: {1e3*tB:.0f} ms")
    # raw compute time with a scalar-fetch program is ~425 ms; time a
    # bare back-to-back dispatch+fetch here for calibration
    for trial in range(2):
        fA = aligner._fused_pair_dispatch(mk(r1, q1, 1),
                                          mk(r2, q2, 1), L)
        t0 = _t.time()
        fA.host()
        log(f"single dispatch+fetch: {1e3*(_t.time()-t0):.0f} ms")


def amortized_probe():
    """True per-program fused time: N back-to-back dispatches, fetch
    only the last — amortizes fixed per-call overhead."""
    import time as _t
    n_pairs = int(os.environ.get("PROF_PAIRS", 32768))
    L = 150
    gbases = make_genome()
    g = Genome(chroms=[gbases], scaffolds=[
        Scaffold(chrom=1, sid=1, start=0, length=len(gbases),
                 name="ecoli_like")]).finalize()
    index = build_index(g, 13)
    analyze_index(index, 0.01)
    aligner = BBMapAligner(g, index)
    r1, r2, q1, q2, t1, t2 = make_pairs(gbases, n_pairs * 2, L=L,
                                        seed=79)

    def mk(rows, quals, b):
        lo = b * n_pairs
        return ReadBatch(
            bases=rows[lo:lo + n_pairs],
            quality=None if quals is None else quals[lo:lo + n_pairs],
            lengths=np.full(n_pairs, L, np.int32),
            ids=[str(i) for i in range(lo, lo + n_pairs)],
            numeric_ids=np.arange(lo, lo + n_pairs, dtype=np.int64))

    aligner.map_pairs_columnar(mk(r1, q1, 0), mk(r2, q2, 0))
    log("warm")
    for N in (1, 4):
        t0 = _t.time()
        fs = [aligner._fused_pair_dispatch(mk(r1, q1, 1),
                                           mk(r2, q2, 1), L)
              for _ in range(N)]
        fs[-1].host()
        dt = _t.time() - t0
        log(f"N={N}: total {1e3*dt:.0f} ms -> "
            f"{1e3*dt/N:.0f} ms/program")


if __name__ == "__main__":
    if os.environ.get("AMORT_PROBE"):
        amortized_probe()
    elif os.environ.get("LINK_PROBE"):
        link_probe()
    else:
        main()


