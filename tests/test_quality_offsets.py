"""Quality-probability key offset selection
(reference: align2/QualityTools.makeKeyProbs:188-247 +
 align2/KeyRing.makeOffsets3:396-506)."""

import numpy as np

from bbmap_tpu.align import seed


def test_key_probs_flat_quality():
    q = np.full(100, 30, np.int64)
    p = seed.make_key_probs(q, 13)
    assert len(p) == 88
    # 13 bases at q30: 1 - (1-1e-3)^13 ~ 0.0129
    assert abs(p[0] - (1 - (1 - 1e-3) ** 13)) < 1e-4
    assert np.allclose(p, p[0], atol=1e-6)


def test_key_probs_zero_quality_forces_one():
    q = np.full(50, 30, np.int64)
    q[20] = 0  # N base
    p = seed.make_key_probs(q, 13)
    # windows covering position 20 -> prob 1
    for off in range(8, 21):
        assert p[off] == 1.0
    assert p[0] < 0.1
    assert p[25] < 0.1


def test_offsets3_avoids_bad_region():
    L, k = 100, 13
    q = np.full(L, 35, np.int64)
    q[40:52] = 0  # dead center
    probs = seed.make_key_probs(q, k)
    off = seed.make_offsets3(probs, L, k, 1.9, 3.0, 2)
    assert off is not None and len(off) >= 2
    # no selected key window may contain the dead region
    for o in off:
        assert probs[o] < 0.9999
        assert not (o <= 51 and o + k > 40), o


def test_offsets3_trims_bad_ends():
    L, k = 100, 13
    q = np.full(L, 2, np.int64)  # hopeless everywhere
    q[30:70] = 35                # except the middle
    probs = seed.make_key_probs(q, k)
    off = seed.make_offsets3(probs, L, k, 1.9, 3.0, 2)
    assert off is not None
    assert off.min() >= 25 and off.max() <= 60


def test_offsets3_all_bad_returns_none():
    L, k = 60, 13
    probs = np.ones(L - k + 1, np.float32)
    assert seed.make_offsets3(probs, L, k, 1.9, 3.0, 2) is None


def test_quality_offsets_batch_only_degraded_recompute():
    L, k = 100, 13
    default = seed.make_offsets(L, k)
    q = np.full((3, L), 35, np.int64)
    q[1, 45] = 0  # read 1 has an N
    out = seed.quality_offsets_batch(q, L, k, default)
    assert (out[0] == default).all()
    assert (out[2] == default).all()
    sel = out[1][out[1] >= 0]
    for o in sel:
        assert not (o <= 45 and o + k > 45)


def test_mapping_with_n_bases_still_works():
    """End-to-end: read with an N run still maps via quality offsets."""
    from bbmap_tpu.core.genome import build_genome
    from bbmap_tpu.index.build import build_index
    from bbmap_tpu.core.batch import ReadBatch
    from bbmap_tpu.align.pipeline import BBMapAligner
    from bbmap_tpu.io.fastx import SeqRecord
    import tempfile, os

    rng = np.random.default_rng(8)
    g = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), 5000))
    fd, fa = tempfile.mkstemp(suffix=".fa")
    os.close(fd)
    with open(fa, "wb") as f:
        f.write(b">s1\n" + g + b"\n")
    genome = build_genome(fa)
    index = build_index(genome, k=13)
    al = BBMapAligner(genome, index, device_quickmap=False)
    s = 2000
    bases = bytearray(g[s:s + 100])
    bases[40:52] = b"N" * 12
    qual = bytes([35] * 40 + [0] * 12 + [35] * 48)
    batch = ReadBatch.from_records(
        [SeqRecord("r0", bytes(bases), bytes(qq + 33 for qq in qual),
                   0)])
    res = al.map_batch(batch)
    os.unlink(fa)
    assert res[0].mapped
    scaf, loc = genome.locate(res[0].chrom, res[0].start)
    assert loc == s
