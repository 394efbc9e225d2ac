"""Benchmark: reads/s/chip mapping synthetic 2x150 bp reads to an
E. coli-scale genome (the BASELINE.json north-star metric).

Runs on whatever jax.devices() provides (real TPU chip under the driver).
Prints ONE JSON line.

Baseline: the reference publishes no numeric throughput table
(BASELINE.md); the figure used here is 30,000 reads/s for single-node Java
BBMap on 2x150bp vs E. coli with 32 threads, a mid-range estimate of the
poster-era "similar in speed to bwa" claim (BASELINE.md rows 1-2).
vs_baseline = value / 30000.
"""

import os
import json
import sys
import time

import numpy as np

BASELINE_READS_PER_SEC = 30_000.0


def make_genome(n=4_600_000, seed=7):
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    return rng.choice(bases, size=n).astype(np.uint8)


def make_reads(genome, n_reads, L=150, err_rate=0.1, seed=11):
    """Sample reads; ~err_rate of them get 1-3 substitutions; half are
    reverse-complemented."""
    from bbmap_tpu.core.bases import COMP_ASCII
    rng = np.random.default_rng(seed)
    starts = rng.integers(0, len(genome) - L, size=n_reads)
    idx = starts[:, None] + np.arange(L)[None, :]
    reads = genome[idx].copy()
    n_err = int(n_reads * err_rate)
    err_rows = rng.choice(n_reads, size=n_err, replace=False)
    for r in err_rows:
        for _ in range(int(rng.integers(1, 4))):
            p = int(rng.integers(0, L))
            reads[r, p] = ord("ACGT"[int(rng.integers(0, 4))])
    flip = rng.random(n_reads) < 0.5
    reads[flip] = COMP_ASCII[reads[flip]][:, ::-1]
    return reads


def main():
    from bbmap_tpu.utils.jaxcfg import enable_compilation_cache
    enable_compilation_cache()
    t_setup = time.time()
    from bbmap_tpu.align.pipeline import BBMapAligner
    from bbmap_tpu.core.batch import ReadBatch
    from bbmap_tpu.core.genome import Genome, Scaffold
    from bbmap_tpu.index.build import analyze_index, build_index
    from bbmap_tpu.io.fastx import SeqRecord

    gbases = make_genome()
    g = Genome(chroms=[gbases], scaffolds=[
        Scaffold(chrom=1, sid=1, start=0, length=len(gbases),
                 name="ecoli_like")]).finalize()
    index = build_index(g, 13)
    analyze_index(index, 0.01)
    aligner = BBMapAligner(g, index)
    setup_s = time.time() - t_setup

    L = 150
    batch_size = int(os.environ.get("BENCH_BATCH", 32768))
    reads = make_reads(gbases, batch_size * 4, L=L)

    def run_batch(lo):
        recs = [SeqRecord(str(i), bytes(reads[i]), b"I" * L, i)
                for i in range(lo, lo + batch_size)]
        b = ReadBatch.from_records(recs)
        res = aligner.map_batch(b)
        return sum(r.mapped for r in res)

    # warmup (compiles)
    n_mapped = run_batch(0)
    t0 = time.time()
    total = 0
    for lo in (batch_size, 2 * batch_size, 3 * batch_size):
        n_mapped += run_batch(lo)
        total += batch_size
    dt = time.time() - t0
    rps = total / dt
    print(json.dumps({
        "metric": "reads_per_sec_per_chip_2x150_ecoli",
        "value": round(rps, 1),
        "unit": "reads/s",
        "vs_baseline": round(rps / BASELINE_READS_PER_SEC, 3),
        "mapped_fraction": round(n_mapped / (4 * batch_size), 4),
        "setup_seconds": round(setup_s, 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
