"""INDEPENDENT line-literal transcription of the reference SAM-layer
math (VERDICT r2 next-step #9: extend the transcription-golden anchor
from the DP to the SAM layer). Test-only oracle — imports NOTHING from
bbmap_tpu production code.

Transcribed functions, each a statement-for-statement rendering of the
Java with original control flow and float widths:

- to_mapq          <- stream/SamLine.toMapq:1709-1721 (float32 math,
                      Tools.log2 = double log, Math.round(float))
- to_cigar13       <- stream/SamLine.toCigar13:600-663
- to_cigar14       <- stream/SamLine.toCigar14:679-746
- make_md_tag      <- stream/SamLine.makeMdTag:1361-1445

Running this module regenerates tests/golden/samline_vectors.json.
"""

from __future__ import annotations

import json
import math
import os

import numpy as np

F32 = np.float32


# --- stream/SamLine.toMapq:1709 -------------------------------------------

def to_mapq(score: int, length: int, mapped: bool, ambig: bool,
            penalize_ambig: bool = True) -> int:
    if (not mapped) or length < 1:
        return 0
    if ambig and penalize_ambig:
        mx = F32(3)
        adjusted = F32(F32(score * mx) / F32(F32(100) * F32(length)))
        return max(1, int(math.floor(F32(adjusted + F32(0.5)))))
    score2 = F32(F32(score - length * 40) * F32(1.6))
    # Tools.log2 is double math (Tools.java:2304); the product with
    # 1.5f widens to float then the sum stays float in Java — rendered
    # as float32 steps
    mx = F32(F32(1.5) * F32(math.log(length) / math.log(2.0)) + F32(36))
    adjusted = F32(F32(score2 * mx) / F32(F32(100) * F32(length)))
    return max(4, int(math.floor(F32(adjusted + F32(0.5)))))


# --- stream/SamLine.toCigar13:600 -----------------------------------------

def to_cigar13(match: bytes, read_start: int, read_stop: int,
               reflen: int, intron_limit: int = 2 ** 31 - 1,
               soft_clip: bool = True):
    if match is None or read_start == read_stop:
        return None
    sb = []
    count = 0
    mode = "="
    last_mode = "="
    refloc = read_start
    for mpos in range(len(match)):
        m = chr(match[mpos])
        sfdflag = False
        if soft_clip and (refloc < 0 or refloc >= reflen):
            mode = "S"
            if m != "I":
                refloc += 1
            if m == "D":
                sfdflag = True
        elif m in ("m", "s", "S", "N", "B"):
            mode = "M"
            refloc += 1
        elif m in ("I", "X", "Y"):
            mode = "I"
        elif m == "D":
            mode = "D"
            refloc += 1
        elif m == "C":
            mode = "S"
            refloc += 1
        else:
            raise ValueError(m)
        if mode != last_mode:
            if count > 0:
                sb.append(str(count))
                if last_mode == "D" and count > intron_limit:
                    sb.append("N")
                else:
                    sb.append(last_mode)
            count = 0
            last_mode = mode
        count += 1
        if sfdflag:
            count -= 1
    sb.append(str(count))
    if mode == "D" and count > intron_limit:
        sb.append("N")
    else:
        sb.append(mode)
    return "".join(sb)


# --- stream/SamLine.toCigar14:679 -----------------------------------------

def to_cigar14(match: bytes, read_start: int, read_stop: int,
               reflen: int, intron_limit: int = 2 ** 31 - 1,
               soft_clip: bool = True):
    if match is None or read_start == read_stop:
        return None
    sb = []
    count = 0
    mode = "="
    last_mode = "="
    refloc = read_start
    for mpos in range(len(match)):
        m = chr(match[mpos])
        sfdflag = False
        if soft_clip and (refloc < 0 or refloc >= reflen):
            mode = "S"
            if m != "I":
                refloc += 1
            if m == "D":
                sfdflag = True
        elif m in ("m", "s"):
            mode = "="
            refloc += 1
        elif m == "S":
            mode = "X"
            refloc += 1
        elif m in ("I", "X", "Y"):
            mode = "I"
        elif m == "D":
            mode = "D"
            refloc += 1
        elif m == "C":
            mode = "S"
            refloc += 1
        elif m in ("N", "B"):
            mode = "M"
            refloc += 1
        else:
            raise ValueError(m)
        if mode != last_mode:
            if count > 0:
                sb.append(str(count))
                if last_mode == "D" and count > intron_limit:
                    sb.append("N")
                else:
                    sb.append(last_mode)
            count = 0
            last_mode = mode
        count += 1
        if sfdflag:
            count -= 1
    sb.append(str(count))
    if mode == "D" and count > intron_limit:
        sb.append("N")
    else:
        sb.append(mode)
    return "".join(sb)


# --- stream/SamLine.makeMdTag:1361 ----------------------------------------

def make_md_tag(refstart: int, match: bytes, call: bytes,
                cha: np.ndarray, scafloc: int, scaflen: int,
                intron_limit: int = 2 ** 31 - 1):
    """cha = the full chromosome byte array (Data.getChromosome.get)."""
    if match is None:
        return None
    md = ["MD:Z:"]
    scafstop = scafloc + scaflen

    def get(i):
        return chr(cha[i]) if 0 <= i < len(cha) else "N"

    prevM = "?"
    count = 0
    dels = 0
    prevSub = False
    rpos = refstart
    cpos = 0
    for mpos in range(len(match)):
        c = chr(call[cpos]) if cpos < len(call) else "?"
        m = chr(match[mpos])
        if prevM == "D" and m != "D":
            if dels <= intron_limit:
                md.append(str(count))
                count = 0
                md.append("^")
                for i in range(rpos - dels, rpos):
                    md.append(get(i))
                dels = 0
        if m == "C" or rpos < scafloc or rpos >= scafstop:
            rpos += 1
            if m != "D":
                cpos += 1
        elif m in ("m", "s"):
            count += 1
            rpos += 1
            cpos += 1
        elif m == "S":
            if count > 0 or not prevSub:
                md.append(str(count))
            md.append(get(rpos))
            count = 0
            rpos += 1
            cpos += 1
            prevSub = True
        elif m == "N":
            r = get(rpos)
            if c == r:
                count += 1
                rpos += 1
                cpos += 1
            else:
                if count > 0 or not prevSub:
                    md.append(str(count))
                md.append(r)
                count = 0
                rpos += 1
                cpos += 1
                prevSub = True
        elif m in ("I", "X", "Y"):
            cpos += 1
        elif m == "D":
            rpos += 1
            dels += 1
        prevM = m
    md.append(str(count))
    return "".join(md)


# --- vector generation -----------------------------------------------------

def _rand_match(rng, n, alphabet="mmmmmmSSNID", clip_head=0,
                clip_tail=0):
    syms = [rng.choice(list(alphabet)) for _ in range(n)]
    s = "C" * clip_head + "".join(syms) + "C" * clip_tail
    return s.encode()


def _call_for(match: bytes, rng, bases="ACGT"):
    """A call string consuming one base per non-D symbol."""
    n = sum(1 for m in match if chr(m) != "D")
    return "".join(rng.choice(list(bases + "N"))
                   for _ in range(n)).encode()


def generate(path: str):
    rng = np.random.default_rng(20260821)
    out = {"mapq": [], "cigar": [], "md": []}

    # mapq grid incl. rounding boundaries
    for length in (1, 37, 50, 100, 150, 151, 251, 600, 6000):
        for frac in (-0.5, 0.0, 0.2, 0.5, 0.56, 0.7, 0.9, 1.0):
            score = int(length * 100 * frac)
            for ambig in (False, True):
                out["mapq"].append({
                    "score": score, "length": length, "mapped": True,
                    "ambig": ambig,
                    "want": to_mapq(score, length, True, ambig)})
    out["mapq"].append({"score": 500, "length": 0, "mapped": True,
                        "ambig": False, "want": 0})
    out["mapq"].append({"score": 500, "length": 100, "mapped": False,
                        "ambig": False, "want": 0})

    # cigars: in-bounds, left-oob, right-oob, clips, big deletions
    reflen = 400
    for t in range(60):
        n = int(rng.integers(5, 60))
        ch = int(rng.integers(0, 4)) if t % 3 == 0 else 0
        ct = int(rng.integers(0, 4)) if t % 4 == 0 else 0
        match = _rand_match(rng, n, clip_head=ch, clip_tail=ct)
        if t % 5 == 0:
            start = -int(rng.integers(1, 10))        # left oob
        elif t % 5 == 1:
            start = reflen - int(rng.integers(1, n))  # right oob
        else:
            start = int(rng.integers(0, reflen - n - 10))
        il = 2 ** 31 - 1 if t % 6 else 10
        stop = start + sum(1 for m in match if chr(m) not in "IXY") - 1
        out["cigar"].append({
            "match": match.decode(), "start": start, "stop": stop,
            "reflen": reflen, "intron": il,
            "want13": to_cigar13(match, start, stop, reflen, il),
            "want14": to_cigar14(match, start, stop, reflen, il)})
    # targeted: consecutive-symbol runs per class
    for mstr in ("mmmmSSmmm", "mmNNmm", "mmBBmm", "ssmm", "mmIIImm",
                 "mmDDDDmm", "CCmmmmCC", "XmmmY"):
        m = mstr.encode()
        stop = sum(1 for c in mstr if c not in "IXY") - 1
        out["cigar"].append({
            "match": mstr, "start": 5, "stop": 5 + stop,
            "reflen": 400, "intron": 2 ** 31 - 1,
            "want13": to_cigar13(m, 5, 5 + stop, 400),
            "want14": to_cigar14(m, 5, 5 + stop, 400)})

    # MD: synthetic chromosome, full walk semantics
    cha = rng.choice(np.frombuffer(b"ACGT", np.uint8),
                     size=500).astype(np.uint8)
    cha_s = bytes(cha).decode()
    for t in range(80):
        n = int(rng.integers(4, 50))
        ch = int(rng.integers(0, 3)) if t % 4 == 0 else 0
        match = _rand_match(rng, n, clip_head=ch)
        call = bytearray(_call_for(match, rng))
        refstart = int(rng.integers(0, 400))
        # half the time, make call agree with ref at m positions and
        # at some N positions (exercises the N match-vs-sub branch)
        rpos = refstart
        cpos = 0
        for m in match:
            mc = chr(m)
            if mc == "D":
                rpos += 1
                continue
            if mc in "ms" or (mc == "N" and rng.random() < 0.5):
                if cpos < len(call) and rpos < len(cha):
                    call[cpos] = cha[rpos]
            if mc not in "IXY":
                rpos += 1
            cpos += 1
        scafloc = 0 if t % 3 else int(rng.integers(0, refstart + 1))
        scaflen = len(cha) - scafloc if t % 3 else \
            int(rng.integers(refstart - scafloc + 5, 500))
        il = 2 ** 31 - 1 if t % 7 else 3
        out["md"].append({
            "refstart": refstart, "match": match.decode(),
            "call": bytes(call).decode(), "scafloc": scafloc,
            "scaflen": scaflen, "intron": il,
            "want": make_md_tag(refstart, match, bytes(call), cha,
                                scafloc, scaflen, il)})
    out["md_chrom"] = cha_s

    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {path}: {len(out['mapq'])} mapq, "
          f"{len(out['cigar'])} cigar, {len(out['md'])} md vectors")


if __name__ == "__main__":
    here = os.path.dirname(os.path.abspath(__file__))
    generate(os.path.join(here, "samline_vectors.json"))
