"""Edit-tolerant containment absorption (VERDICT r2 next-step #10:
Dedupe containment on top of the device banded kernel; reference:
jgi/Dedupe.java:95-117 absorb modes)."""

import numpy as np

from bbmap_tpu.core.bases import COMP_ASCII
from bbmap_tpu.tools import dedupe


class _Rec:
    def __init__(self, rid, bases):
        self.id = rid
        self.bases = bases
        self.quality = None
        self.numeric_id = 0


def _seq(rng, n):
    bases = np.frombuffer(b"ACGT", np.uint8)
    return bytes(rng.choice(bases, n))


def test_exact_containment_absorbed():
    rng = np.random.default_rng(1)
    big = _seq(rng, 400)
    small = big[100:220]
    recs = [_Rec("big", big), _Rec("small", small)]
    out = list(dedupe.dedupe_stream(iter(recs),
                                    absorb_containment=True))
    assert [d for _, d in out] == [False, True]


def test_containment_with_subs_absorbed():
    rng = np.random.default_rng(2)
    big = _seq(rng, 400)
    arr = np.frombuffer(big[120:260], np.uint8).copy()
    arr[10] = ord("A") if arr[10] != ord("A") else ord("C")
    arr[70] = ord("G") if arr[70] != ord("G") else ord("T")
    small = bytes(arr)
    assert small not in big
    recs = [_Rec("big", big), _Rec("small", small)]
    # without tolerance: kept
    out0 = list(dedupe.dedupe_stream(iter(recs),
                                     absorb_containment=True))
    assert [d for _, d in out0] == [False, False]
    # subs=2: absorbed through the banded infix verification
    out2 = list(dedupe.dedupe_stream(iter(recs), subs=2,
                                     absorb_containment=True))
    assert [d for _, d in out2] == [False, True]


def test_containment_rc_with_edits():
    rng = np.random.default_rng(3)
    big = _seq(rng, 500)
    window = np.frombuffer(big[200:340], np.uint8)
    rc = COMP_ASCII[window][::-1].copy()
    rc = np.delete(rc, 50)          # one deletion
    recs = [_Rec("big", big), _Rec("rcsmall", bytes(rc))]
    out = list(dedupe.dedupe_stream(iter(recs), edits=1,
                                    absorb_containment=True))
    assert [d for _, d in out] == [False, True]


def test_unrelated_not_absorbed():
    rng = np.random.default_rng(4)
    recs = [_Rec("a", _seq(rng, 300)), _Rec("b", _seq(rng, 120))]
    out = list(dedupe.dedupe_stream(iter(recs), subs=2, edits=1,
                                    absorb_containment=True))
    assert [d for _, d in out] == [False, False]


def test_near_dup_batched_path(monkeypatch):
    """subs/edits near-duplicate detection agrees with the device
    batched kernel forced on and off."""
    rng = np.random.default_rng(5)
    base = _seq(rng, 150)
    recs = [_Rec("r0", base)]
    for i in range(12):
        arr = np.frombuffer(base, np.uint8).copy()
        for _ in range(i % 4):
            arr[int(rng.integers(0, 150))] = ord("ACGT"[i % 4])
        recs.append(_Rec(f"r{i+1}", bytes(arr)))
    for mode in ("0", "1"):
        monkeypatch.setenv("BBMAP_DEVICE_BANDED", mode)
        out = [d for _, d in dedupe.dedupe_stream(
            iter(recs), edits=3, absorb_containment=False)]
        if mode == "0":
            want = out
        else:
            assert out == want
