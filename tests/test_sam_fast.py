"""Fast-path vs reference-loop equality for the SAM hot functions.

match_to_cigar and calc_nm gained C-level fast paths for the fully
in-bounds / unclipped common case; these property tests pin them to the
original loop implementations (which mirror the reference,
stream/SamLine.toCigar14:679 / :1515-1540) over random match strings.
"""

import numpy as np
import pytest

from bbmap_tpu.io import sam as samio


def _random_match(rng, n):
    # weighted toward m with occasional runs of everything else
    syms = np.frombuffer(b"mSNIDC", np.uint8)
    w = np.array([0.75, 0.08, 0.04, 0.05, 0.05, 0.03])
    out = rng.choice(syms, n, p=w)
    return bytes(out)


def _nm_loop(match, cigar, read_len):
    """Original unclipped-agnostic loop (kept verbatim as the oracle)."""
    leftclip = samio._cigar_left_clip(cigar)
    rightclip = samio._cigar_right_clip(cigar)
    frm, to = leftclip, read_len - rightclip
    nm = dels = cpos = 0
    for m in match:
        ch = chr(m)
        if frm <= cpos < to:
            if ch in "ISNXY":
                nm += 1
            if ch == "D":
                dels += 1
            else:
                if dels <= samio.INTRON_LIMIT:
                    nm += dels
                dels = 0
        if ch != "D":
            cpos += 1
    if dels <= samio.INTRON_LIMIT:
        nm += dels
    return nm


@pytest.mark.parametrize("version", [1.3, 1.4])
def test_cigar_fast_matches_slow(version):
    rng = np.random.default_rng(7)
    for trial in range(200):
        n = int(rng.integers(1, 200))
        m = _random_match(rng, n)
        if m.endswith(b"D"):
            m = m[:-1] + b"m"
        ref_consumed = sum(1 for c in m if c not in b"IXY")
        # in-bounds geometry so both paths are exercised on the same input
        fast = samio.match_to_cigar(m, 5, 5 + ref_consumed - 1,
                                    10_000, version)
        slow = samio._match_to_cigar_slow(m, 5, 5 + ref_consumed - 1,
                                          10_000, version)
        assert fast == slow, (m, fast, slow)


def test_cigar_out_of_bounds_still_slow_path():
    # negative start -> soft clip conversion must still happen
    m = b"mmmmmmmmmm"
    c = samio.match_to_cigar(m, -3, 6, 1000)
    assert c.startswith("3S")


def test_nm_fast_matches_loop():
    rng = np.random.default_rng(11)
    for trial in range(200):
        n = int(rng.integers(1, 200))
        m = _random_match(rng, n)
        if m.endswith(b"D"):
            m = m[:-1] + b"m"
        read_len = sum(1 for c in m if c != ord("D"))
        ref_consumed = sum(1 for c in m if c not in b"IXY")
        cigar = samio.match_to_cigar(m, 0, ref_consumed - 1, 10_000)
        assert samio.calc_nm(m, cigar, read_len) == \
            _nm_loop(m, cigar, read_len)


def test_clip_counts():
    assert samio.count_leading_clip(b"CCCmmS") == 3
    assert samio.count_trailing_clip(b"mmSCC") == 2
    assert samio.count_leading_clip(b"mm") == 0
    assert samio.count_leading_clip(b"") == 0
    assert samio.count_leading_clip(b"CCCC") == 4


def test_intron_limit_converts_long_deletions(monkeypatch):
    """intronlen: deletion runs longer than INTRON_LIMIT print as N ops
    (reference: stream/SamLine toCigar D>INTRON_LIMIT -> N,
    align2/BBMap.java:239-240)."""
    monkeypatch.setattr(samio, "INTRON_LIMIT", 50)
    m = b"m" * 30 + b"D" * 100 + b"m" * 30
    c = samio.match_to_cigar(m, 0, 159, 10_000)
    assert "100N" in c and "D" not in c
    # short deletions stay D
    m2 = b"m" * 30 + b"D" * 10 + b"m" * 30
    c2 = samio.match_to_cigar(m2, 0, 69, 10_000)
    assert "10D" in c2 and "N" not in c2
    # NM excludes intron-length deletions
    assert samio.calc_nm(m, c, 60) == 0
    assert samio.calc_nm(m2, c2, 60) == 10
