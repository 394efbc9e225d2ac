"""Pair handling + name-based utilities: splitpairs, repair, filterbyname,
demuxbyname.

reference: jgi/SplitPairsAndSingles.java (bbsplitpairs.sh),
jgi/DemuxByName.java, driver/FilterReadsByName.java.
"""

from __future__ import annotations

import sys
from typing import Dict, List, Set

from ..io import fastx
from ..utils.args import Args


def _core_name(name: str) -> str:
    n = name.split()[0]
    if len(n) > 2 and n[-2] == "/" and n[-1] in "12":
        return n[:-2]
    return n


def _wfq(fh, rec):
    q = rec.quality if rec.quality is not None else b"I" * len(rec.bases)
    fh.write(b"@" + rec.id.encode() + b"\n" + rec.bases + b"\n+\n" + q
             + b"\n")


def splitpairs(argv: List[str]) -> int:
    """Separate interleaved input into proper pairs and singletons; also
    re-pairs out-of-order mates (reference: jgi/SplitPairsAndSingles
    repair mode)."""
    args = Args.parse(argv)
    in1 = args.get("in", "in1")
    out = args.get("out", "outpair")
    outs = args.get("outs", "outsingle", "outb")
    repair = args.get_bool("repair", "fixinterleaving", "fint",
                           default=True)
    if in1 is None:
        print("Usage: splitpairs in=<interleaved> out=pairs.fq "
              "outs=singles.fq", file=sys.stderr)
        return 1
    pending: Dict[str, fastx.SeqRecord] = {}
    out_fh = fastx.xopen(out, "wb") if out else None
    outs_fh = fastx.xopen(outs, "wb") if outs else None
    pairs = singles = 0
    for rec in fastx.read_seqs(in1):
        core = _core_name(rec.id)
        if core in pending:
            mate = pending.pop(core)
            if out_fh:
                _wfq(out_fh, mate)
                _wfq(out_fh, rec)
            pairs += 2
        else:
            pending[core] = rec
    for rec in pending.values():
        if outs_fh:
            _wfq(outs_fh, rec)
        singles += 1
    for fh in (out_fh, outs_fh):
        if fh:
            fh.close()
    sys.stderr.write(f"Pairs:\t{pairs}\nSingletons:\t{singles}\n")
    return 0


def filterbyname(argv: List[str]) -> int:
    """Keep or exclude reads by name list
    (reference: driver/FilterReadsByName, filterbyname.sh)."""
    args = Args.parse(argv)
    in1 = args.get("in", "in1")
    out = args.get("out")
    names_arg = args.get("names")
    include = args.get_bool("include", default=False)
    substring = args.get_bool("substring", default=False)
    if in1 is None or out is None or names_arg is None:
        print("Usage: filterbyname in= out= names=<file|list> "
              "include=f", file=sys.stderr)
        return 1
    names: Set[str] = set()
    import os
    for tok in names_arg.split(","):
        if os.path.exists(tok):
            with fastx.xopen(tok, "rt") as fh:
                for line in fh:
                    names.add(line.strip())
        else:
            names.add(tok)
    out_fh = fastx.xopen(out, "wb")
    kept = 0
    fmt = fastx.sniff_format(in1)
    for rec in fastx.read_seqs(in1):
        nm = rec.id
        if substring:
            hit = any(s in nm for s in names)
        else:
            hit = nm in names or nm.split()[0] in names
        if hit == include:
            kept += 1
            if fmt == "fasta":
                out_fh.write(b">" + rec.id.encode() + b"\n" + rec.bases
                             + b"\n")
            else:
                _wfq(out_fh, rec)
    out_fh.close()
    sys.stderr.write(f"Kept:\t{kept}\n")
    return 0


def demuxbyname(argv: List[str]) -> int:
    """Route reads to files by name suffix/prefix/barcode
    (reference: jgi/DemuxByName.java)."""
    args = Args.parse(argv)
    in1 = args.get("in", "in1")
    pattern = args.get("out", "pattern")
    names_arg = args.get("names")
    suffix = args.get_bool("suffixmode", "suffix", default=False)
    delimiter = args.get("delimiter")
    if in1 is None or pattern is None or "%" not in (pattern or ""):
        print("Usage: demuxbyname in= out=out_%.fq names=a,b,c "
              "[suffixmode=t] [delimiter=:]", file=sys.stderr)
        return 1
    keys = names_arg.split(",") if names_arg else None
    fhs: Dict[str, object] = {}
    counts: Dict[str, int] = {}
    for rec in fastx.read_seqs(in1):
        nm = rec.id.split()[0]
        key = None
        if delimiter:
            key = rec.id.split(delimiter)[-1]
        elif keys:
            for cand in keys:
                if (nm.endswith(cand) if suffix else nm.startswith(cand)):
                    key = cand
                    break
        if key is None:
            continue
        if key not in fhs:
            fhs[key] = fastx.xopen(pattern.replace("%", key), "wb")
        _wfq(fhs[key], rec)
        counts[key] = counts.get(key, 0) + 1
    for fh in fhs.values():
        fh.close()
    for key, cnt in sorted(counts.items()):
        sys.stderr.write(f"{key}\t{cnt}\n")
    return 0


TOOLS = dict(splitpairs=splitpairs, filterbyname=filterbyname,
             demuxbyname=demuxbyname)


def main(argv: List[str]) -> int:
    if not argv or argv[0] not in TOOLS:
        print("pair tools: " + ", ".join(TOOLS), file=sys.stderr)
        return 1
    return TOOLS[argv[0]](argv[1:])


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))


NEXTERA_JUNCTION = b"CTGTCTCTTATACACATCT"


def splitnexteralmp(argv: List[str]) -> int:
    """splitnexteralmp: split Nextera Long-Mate-Pair reads at the
    junction adapter into mate pairs (reference:
    jgi/SplitNexteraLMP.java + sh/splitnexteralmp.sh — reads containing
    the junction CTGTCTCTTATACACATCT split into left/right mates; the
    right half is reverse-complemented to restore innie orientation;
    junction-free reads go to outu as fragments)."""
    import numpy as np
    from ..core.bases import COMP_ASCII
    from ..io import fastx
    from ..utils.args import Args

    args = Args.parse(argv)
    in1 = args.get("in", "in1") or (args.positional[0]
                                    if args.positional else None)
    out1 = args.get("out", "out1")
    out2 = args.get("out2")
    outu = args.get("outu", "outunknown")
    minlen = args.get_int("minlength", "minlen", default=40)
    mask = args.get_bool("mask", default=False)
    if in1 is None or out1 is None:
        print("Usage: splitnexteralmp in=<reads.fq> out=<1.fq> "
              "out2=<2.fq> [outu=] [minlen=40]", file=sys.stderr)
        return 1
    junc = NEXTERA_JUNCTION
    rc_junc = bytes(COMP_ASCII[np.frombuffer(junc, np.uint8)][::-1])
    o1 = fastx.xopen(out1, "wb")
    o2 = fastx.xopen(out2, "wb") if out2 else None
    ou = fastx.xopen(outu, "wb") if outu else None
    n = n_split = n_frag = 0

    def wr(fh, name, seq, qual):
        if fh is None:
            return
        q = qual if qual is not None and len(qual) == len(seq) \
            else b"I" * len(seq)
        fh.write(b"@" + name.encode() + b"\n" + seq + b"\n+\n" + q
                 + b"\n")

    for rec in fastx.read_seqs(in1, fake_quality=30):
        n += 1
        pos = rec.bases.find(junc)
        jl = len(junc)
        if pos < 0:
            pos = rec.bases.find(rc_junc)
        if pos < 0:
            if mask:
                wr(ou or o1, rec.id, rec.bases, rec.quality)
            else:
                n_frag += 1
                wr(ou if ou else o1, rec.id, rec.bases, rec.quality)
            continue
        left = rec.bases[:pos]
        right = rec.bases[pos + jl:]
        ql = rec.quality[:pos] if rec.quality else None
        qr = rec.quality[pos + jl:] if rec.quality else None
        if len(left) < minlen or len(right) < minlen:
            # keep the longer side as a fragment
            keep, kq = (left, ql) if len(left) >= len(right) \
                else (right, qr)
            if len(keep) >= minlen:
                n_frag += 1
                wr(ou if ou else o1, rec.id, keep, kq)
            continue
        n_split += 1
        # LMP chemistry: both mates read outward from the junction ->
        # rc the right side to produce standard innie orientation
        right_rc = bytes(COMP_ASCII[np.frombuffer(right,
                                                  np.uint8)][::-1])
        qr_rc = qr[::-1] if qr else None
        wr(o1, rec.id + " 1:", left, ql)
        wr(o2 if o2 else o1, rec.id + " 2:", right_rc, qr_rc)
    for fh in (o1, o2, ou):
        if fh is not None:
            fh.close()
    sys.stderr.write(f"Reads:\t{n}\nSplit pairs:\t{n_split}\n"
                     f"Fragments:\t{n_frag}\n")
    return 0
