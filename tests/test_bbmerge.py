"""BBMerge overlap/merge tests with synthetic truth."""

import numpy as np
import pytest

from bbmap_tpu.core.bases import COMP_ASCII
from bbmap_tpu.core.batch import ReadBatch
from bbmap_tpu.io.fastx import SeqRecord
from bbmap_tpu.ops import overlap as ov
from bbmap_tpu.tools.bbmerge import BBMerge

BASES = np.frombuffer(b"ACGT", np.uint8)


def make_pair(rng, insert=150, rlen=100, subs=0):
    """Fragment of `insert` bp; r1 = first rlen bases, r2 = rc of last."""
    frag = rng.choice(BASES, insert).astype(np.uint8)
    r1 = frag[:rlen].copy()
    r2 = COMP_ASCII[frag[insert - rlen:]][::-1].copy()
    for _ in range(subs):
        p = int(rng.integers(0, rlen))
        r1[p] = BASES[(int(np.searchsorted(BASES, r1[p])) + 1) % 4]
    return frag, r1, r2


def test_overlap_exact():
    rng = np.random.default_rng(0)
    inserts = [120, 150, 180]
    r1s, r2s = [], []
    for ins in inserts:
        _, r1, r2 = make_pair(rng, ins, 100)
        r1s.append(r1)
        r2s.append(r2)
    a = np.stack(r1s)
    b = np.stack([COMP_ASCII[r][::-1] for r in r2s])  # rc back to fwd
    q = np.full(a.shape, 30, np.int8)
    ins, bad, ambig = ov.mate_by_overlap_batch(a, q, b, q)
    assert list(ins) == inserts
    assert not ambig.any()
    assert (bad == 0).all()


def test_overlap_with_mismatch():
    rng = np.random.default_rng(1)
    _, r1, r2 = make_pair(rng, 140, 100)
    # put one mismatch inside the overlap region
    r1[80] = BASES[(int(np.searchsorted(BASES, r1[80])) + 1) % 4]
    a = r1[None, :]
    b = COMP_ASCII[r2][::-1][None, :]
    q = np.full(a.shape, 30, np.int8)
    ins, bad, ambig = ov.mate_by_overlap_batch(a, q, b, q)
    assert ins[0] == 140
    assert bad[0] == 1


def test_no_overlap():
    rng = np.random.default_rng(2)
    r1 = rng.choice(BASES, 100).astype(np.uint8)
    r2 = rng.choice(BASES, 100).astype(np.uint8)
    q = np.full((1, 100), 30, np.int8)
    ins, bad, ambig = ov.mate_by_overlap_batch(r1[None], q, r2[None], q)
    assert ins[0] == -1


def test_join_consensus():
    rng = np.random.default_rng(3)
    frag, r1, r2 = make_pair(rng, 150, 100)
    a = r1[None, :]
    b = COMP_ASCII[r2][::-1][None, :]
    qa = np.full((1, 100), 30, np.int16)
    qb = np.full((1, 100), 20, np.int16)
    joined = ov.join_pairs(a, qa, b, qb, np.array([150]))
    bases, qual = joined[0]
    assert bases == bytes(frag)
    # agreeing overlap bases: min(30 + 20//4, 41) = 35
    assert qual[60] == 35 + 33
    # r1-only region keeps r1 quality
    assert qual[10] == 30 + 33


def test_merge_batch_end_to_end():
    rng = np.random.default_rng(4)
    recs1, recs2, true_ins = [], [], []
    for i in range(50):
        ins = int(rng.integers(110, 190))
        frag, r1, r2 = make_pair(rng, ins, 100)
        recs1.append(SeqRecord(f"p{i}", bytes(r1), b"?" * 100, i))
        recs2.append(SeqRecord(f"p{i}", bytes(r2), b"?" * 100, i))
        true_ins.append(ins)
    m = BBMerge()
    inserts, joined = m.merge_batch(ReadBatch.from_records(recs1),
                                    ReadBatch.from_records(recs2))
    ok = inserts > 0
    assert ok.sum() >= 45  # nearly all merge
    assert all(int(inserts[i]) == true_ins[i]
               for i in range(50) if ok[i])
    for i in range(50):
        if ok[i]:
            assert len(joined[i][0]) == true_ins[i]


def test_ratio_mode_end_to_end():
    rng = np.random.default_rng(7)
    recs1, recs2, true_ins = [], [], []
    for i in range(50):
        ins = int(rng.integers(110, 190))
        frag, r1, r2 = make_pair(rng, ins, 100)
        recs1.append(SeqRecord(f"p{i}", bytes(r1), b"?" * 100, i))
        recs2.append(SeqRecord(f"p{i}", bytes(r2), b"?" * 100, i))
        true_ins.append(ins)
    m = BBMerge(use_ratio=True)
    inserts, joined = m.merge_batch(ReadBatch.from_records(recs1),
                                    ReadBatch.from_records(recs2))
    ok = inserts > 0
    assert ok.sum() >= 45
    assert all(int(inserts[i]) == true_ins[i]
               for i in range(50) if ok[i])


def test_ratio_mode_rejects_random():
    rng = np.random.default_rng(8)
    r1 = [SeqRecord("x", bytes(rng.choice(BASES, 100)), b"?" * 100, 0)]
    r2 = [SeqRecord("x", bytes(rng.choice(BASES, 100)), b"?" * 100, 0)]
    m = BBMerge(use_ratio=True)
    inserts, _ = m.merge_batch(ReadBatch.from_records(r1),
                               ReadBatch.from_records(r2))
    assert inserts[0] == -1
