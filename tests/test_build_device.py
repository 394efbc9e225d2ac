"""Device-parallel index build parity (SURVEY §2.11 P3, VERDICT r2
missing #8): starts/sites bit-identical to the host build."""

import numpy as np
import pytest

from bbmap_tpu.core.genome import Genome, Scaffold
from bbmap_tpu.index.build import analyze_index, build_index
from bbmap_tpu.index.build_device import build_index_device


pytestmark = pytest.mark.slow  # multi-minute battery (--runslow)

def _genome(rng, sizes, n_frac=0.001):
    bases = np.frombuffer(b"ACGT", np.uint8)
    chroms = []
    for n in sizes:
        c = rng.choice(bases, n).astype(np.uint8)
        nn = int(n * n_frac)
        if nn:
            c[rng.choice(n, nn, replace=False)] = ord("N")
        chroms.append(c)
    return Genome(chroms=chroms, scaffolds=[
        Scaffold(chrom=i + 1, sid=i + 1, start=0, length=len(c),
                 name=f"s{i}") for i, c in enumerate(chroms)
    ]).finalize()


@pytest.mark.parametrize("k", [8, 13])
def test_build_device_parity(k):
    rng = np.random.default_rng(k)
    g = _genome(rng, (30_000, 20_000))
    a = build_index(g, k)
    b = build_index_device(g, k)
    np.testing.assert_array_equal(a.starts, b.starts)
    np.testing.assert_array_equal(a.sites, b.sites)


def test_build_device_usable_by_aligner():
    """The device-built index maps reads identically to the host-built
    one (including after analyze_index exclusion)."""
    from bbmap_tpu.align.pipeline import BBMapAligner
    from bbmap_tpu.core.batch import ReadBatch

    rng = np.random.default_rng(3)
    g = _genome(rng, (50_000,), n_frac=0)
    gc = g.chroms[0]
    L, B = 100, 32
    starts = rng.integers(0, len(gc) - L, B)
    reads = np.stack([gc[s:s + L] for s in starts])

    outs = []
    for builder in (build_index, build_index_device):
        idx = builder(g, 13)
        analyze_index(idx, 0.01)
        al = BBMapAligner(g, idx)
        batch = ReadBatch(bases=reads, quality=None,
                          lengths=np.full(B, L, np.int32),
                          ids=[str(i) for i in range(B)],
                          numeric_ids=np.arange(B, dtype=np.int64))
        mb = al.map_batch_columnar(batch)
        outs.append((mb.mapped.copy(), mb.start.copy(),
                     mb.score.copy()))
    for x, y in zip(outs[0], outs[1]):
        np.testing.assert_array_equal(x, y)
