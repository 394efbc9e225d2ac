"""BBDuk engine tests: k-mer matching, hdist, ktrim, qtrim, kmask."""

import numpy as np
import pytest

from bbmap_tpu.core.batch import ReadBatch
from bbmap_tpu.index import kmerset
from bbmap_tpu.io.fastx import SeqRecord
from bbmap_tpu.tools.bbduk import BBDuk, optimal_trim_points

ADAPTER = b"AGATCGGAAGAGCACACGTCTGAACTCCAGTCAC"


def _recs(seqs, qual=None):
    return [SeqRecord(f"r{i}", s,
                      qual if qual is not None else b"I" * len(s), i)
            for i, s in enumerate(seqs)]


def _rand(n, seed=0):
    rng = np.random.default_rng(seed)
    return bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), n))


def test_kmer_set_contains():
    ks = kmerset.build_kmer_set([ADAPTER], k=23, mask_middle=False)
    kmers, valid = kmerset.rolling_kmers_batch(
        np.frombuffer(ADAPTER, np.uint8)[None, :], 23)
    vals = ks.to_values(kmers[0], 23)
    assert ks.contains(vals).all()
    # random kmers miss
    junk = np.frombuffer(_rand(50, 5), np.uint8)
    jk, _ = kmerset.rolling_kmers_batch(junk[None, :], 23)
    assert not ks.contains(ks.to_values(jk[0], 23)).any()


def test_rcomp_canonical():
    from bbmap_tpu.core.bases import reverse_complement_ascii
    ks = kmerset.build_kmer_set([ADAPTER], k=23)
    rc = bytes(reverse_complement_ascii(np.frombuffer(ADAPTER, np.uint8)))
    kmers, _ = kmerset.rolling_kmers_batch(
        np.frombuffer(rc, np.uint8)[None, :], 23)
    assert ks.contains(ks.to_values(kmers[0], 23)).all()


def test_hdist():
    mutant = bytearray(ADAPTER)
    mutant[10] = ord("A") if mutant[10] != ord("A") else ord("C")
    ks0 = kmerset.build_kmer_set([ADAPTER], k=23, hdist=0,
                                 mask_middle=False)
    ks1 = kmerset.build_kmer_set([ADAPTER], k=23, hdist=1,
                                 mask_middle=False)
    kmers, _ = kmerset.rolling_kmers_batch(
        np.frombuffer(bytes(mutant), np.uint8)[None, :], 23)
    v = ks1.to_values(kmers[0], 23)
    assert ks1.contains(v).any()
    v0 = ks0.to_values(kmers[0], 23)
    # without expansion most mutant-containing kmers miss
    assert v0.shape == v.shape


def test_filter_mode():
    clean = _rand(100, 1)
    dirty = _rand(40, 2) + ADAPTER + _rand(26, 3)
    duk = BBDuk([ADAPTER], ["a"], k=23, ktrim="f")
    batch = ReadBatch.from_records(_recs([clean, dirty]))
    keep, recs, matched = duk.process_batch(batch)
    assert list(keep) == [True, False]
    assert list(matched) == [False, True]


def test_ktrim_r():
    prefix = _rand(60, 4)
    read = prefix + ADAPTER + _rand(6, 5)
    duk = BBDuk([ADAPTER], ["a"], k=23, ktrim="r")
    batch = ReadBatch.from_records(_recs([read]))
    keep, recs, matched = duk.process_batch(batch)
    assert keep[0]
    assert recs[0].bases == prefix


def test_ktrim_l():
    suffix = _rand(60, 6)
    read = _rand(6, 7) + ADAPTER + suffix
    duk = BBDuk([ADAPTER], ["a"], k=23, ktrim="l")
    batch = ReadBatch.from_records(_recs([read]))
    keep, recs, matched = duk.process_batch(batch)
    assert keep[0]
    assert recs[0].bases == suffix


def test_kmask():
    read = _rand(30, 8) + ADAPTER + _rand(30, 9)
    duk = BBDuk([ADAPTER], ["a"], k=23, kmask="N")
    batch = ReadBatch.from_records(_recs([read]))
    keep, recs, matched = duk.process_batch(batch)
    assert keep[0]
    b = recs[0].bases
    assert b[:30] == read[:30]
    assert b[30:30 + len(ADAPTER)] == b"N" * len(ADAPTER)
    assert b[30 + len(ADAPTER):] == read[30 + len(ADAPTER):]


def test_qtrim():
    seq = _rand(50, 10)
    qual = bytes([2 + 33] * 10 + [35 + 33] * 30 + [2 + 33] * 10)
    duk = BBDuk([], [], k=23, qtrim="rl", trimq=10)
    batch = ReadBatch.from_records([SeqRecord("q", seq, qual, 0)])
    keep, recs, matched = duk.process_batch(batch)
    assert recs[0].bases == seq[10:40]


def test_mink_tip_trim():
    # adapter prefix of 12 bases at the read's right tip
    prefix = _rand(80, 11)
    read = prefix + ADAPTER[:12]
    duk = BBDuk([ADAPTER], ["a"], k=23, mink=8, ktrim="r")
    batch = ReadBatch.from_records(_recs([read]))
    keep, recs, matched = duk.process_batch(batch)
    assert recs[0].bases == prefix


def test_tbo_pair_overlap_trim(tmp_path):
    """Short-insert pair: adapters past the insert are trimmed by overlap."""
    from bbmap_tpu.tools import bbduk as bbduk_tool
    from bbmap_tpu.core.bases import COMP_ASCII
    rng = np.random.default_rng(31)
    frag = rng.choice(np.frombuffer(b"ACGT", np.uint8), 80).astype(np.uint8)
    adapter = ADAPTER[:20]
    r1 = bytes(frag) + adapter  # insert 80, read 100
    r2 = bytes(COMP_ASCII[frag][::-1]) + adapter
    in1 = tmp_path / "r1.fq"
    in2 = tmp_path / "r2.fq"
    for path, seq in ((in1, r1), (in2, r2)):
        with open(path, "wb") as fh:
            fh.write(b"@p\n" + seq + b"\n+\n" + b"I" * len(seq) + b"\n")
    o1 = tmp_path / "o1.fq"
    o2 = tmp_path / "o2.fq"
    assert bbduk_tool.main([f"in={in1}", f"in2={in2}", f"out={o1}",
                            f"out2={o2}", "tbo=t"]) == 0
    from bbmap_tpu.io import fastx
    rec1 = next(iter(fastx.read_seqs(str(o1))))
    rec2 = next(iter(fastx.read_seqs(str(o2))))
    assert len(rec1.bases) == 80
    assert len(rec2.bases) == 80
    assert rec1.bases == bytes(frag)


def test_kbig_emulation():
    """kbig>31 matches require runs of consecutive k-mer hits."""
    rng = np.random.default_rng(40)
    ref40 = _rand(40, 41)  # 40-mer contaminant
    # read contains only 25 bases of the contaminant: a k=23 hit exists
    # but no 40-mer run
    partial = _rand(40, 42) + ref40[:25] + _rand(35, 43)
    full = _rand(30, 44) + ref40 + _rand(30, 45)
    duk = BBDuk([ref40], ["c"], k=23, kbig=40, mask_middle=False)
    batch = ReadBatch.from_records(_recs([partial, full]))
    keep, recs, matched = duk.process_batch(batch)
    assert list(matched) == [False, True]
