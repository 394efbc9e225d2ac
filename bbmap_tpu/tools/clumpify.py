"""clumpify: reorder reads by shared pivot k-mer for better compression.

reference: clump/Clumpify.java:21 + KmerComparator:21 + sh/clumpify.sh.
Reads sharing a minimizer-like pivot k-mer (the hashed-minimum canonical
k-mer) are grouped adjacently so gzip finds their shared sequence
(reference groups 3-6x better compression). Optional dedupe removes
duplicates within clumps (reference: clumpify dedupe flag).

Implementation: one vectorized pass computes each read's pivot
(min over positions of hash(canonical k-mer)); reads are then sorted by
(pivot, pivot offset, sequence) — a device-sort-friendly formulation of
the reference's KmerSort.
"""

from __future__ import annotations

import sys
from typing import List

import numpy as np

from ..core.batch import ReadBatch, batched
from ..index.build import reverse_complement_key
from ..index.kmerset import rolling_kmers_batch
from ..io import fastx
from ..utils.args import Args


def _hash64(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64)
    x = (x ^ (x >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
    x &= np.uint64(2 ** 64 - 1)
    x = (x ^ (x >> np.uint64(29))) * np.uint64(0xC4CEB9FE1A85EC53)
    x &= np.uint64(2 ** 64 - 1)
    return x ^ (x >> np.uint64(32))


def pivots(bases: np.ndarray, k: int) -> np.ndarray:
    """(B, L) -> (B,) uint64 pivot = min hash of canonical k-mers
    (reference: clump/KmerComparator.java:61-67)."""
    kmers, valid = rolling_kmers_batch(bases, k)
    if kmers.shape[1] == 0:
        return np.zeros(bases.shape[0], np.uint64)
    can = np.minimum(kmers, reverse_complement_key(
        np.where(valid, kmers, 0), k))
    h = _hash64(can)
    h = np.where(valid, h, np.uint64(2 ** 64 - 1))
    return h.min(axis=1)


def main(argv: List[str]) -> int:
    args = Args.parse(argv)
    in1 = args.get("in", "in1") or (args.positional[0]
                                    if args.positional else None)
    out = args.get("out")
    k = args.get_int("k", default=31)
    do_dedupe = args.get_bool("dedupe", default=False)
    if in1 is None or out is None:
        print("Usage: clumpify in=<reads.fq> out=<clumped.fq> [k=31] "
              "[dedupe=t]", file=sys.stderr)
        return 1
    recs = list(fastx.read_seqs(in1))
    if not recs:
        fastx.write_fastq(out, [])
        return 0
    b = ReadBatch.from_records(recs)
    piv = pivots(b.bases, k)
    seqs = [r.bases for r in recs]
    order = sorted(range(len(recs)), key=lambda i: (int(piv[i]), seqs[i]))
    n_dup = 0
    out_recs = []
    prev = None
    for i in order:
        if do_dedupe and prev is not None and seqs[i] == seqs[prev] \
                and recs[i].quality == recs[prev].quality:
            n_dup += 1
            continue
        out_recs.append(recs[i])
        prev = i
    fastx.write_fastq(out, out_recs)
    sys.stderr.write(f"Reads:\t{len(recs)}\nClumps formed:\t"
                     f"{len(np.unique(piv))}\n"
                     + (f"Duplicates removed:\t{n_dup}\n"
                        if do_dedupe else ""))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
