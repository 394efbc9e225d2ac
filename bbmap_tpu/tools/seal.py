"""seal: k-mer based read attribution to multiple reference sequences.

reference: jgi/Seal.java:51 + sh/seal.sh. Each read is assigned to the
reference sequence owning the most of its k-mers (ambig modes first /
toss / all, reference: Seal.java:307-318); per-ref read/base counts and
RPKM are reported, and reads can be routed to per-ref files via a '%'
pattern path.
"""

from __future__ import annotations

import sys
from typing import Dict, List, Optional

import numpy as np

from ..core.batch import ReadBatch, batched
from ..index import kmerset
from ..io import fastx
from ..utils.args import Args


class Seal:
    def __init__(self, ref_seqs: List[bytes], names: List[str],
                 k: int = 31, hdist: int = 0, mask_middle: bool = True,
                 min_kmer_hits: int = 1, ambig: str = "first"):
        self.ks = kmerset.build_kmer_set(
            ref_seqs, k=k, hdist=hdist, mask_middle=mask_middle,
            names=names)
        self.k = k
        self.min_kmer_hits = min_kmer_hits
        self.ambig = ambig
        self.names = names
        self.ref_lengths = np.array([len(s) for s in ref_seqs], np.int64)
        self.reads_per_ref = np.zeros(max(1, len(names)), np.int64)
        self.bases_per_ref = np.zeros(max(1, len(names)), np.int64)
        self.reads_in = 0
        self.reads_matched = 0

    def assign_batch(self, batch: ReadBatch) -> np.ndarray:
        """Returns (B,) int32 ref id per read, -1 unmatched, -2 ambiguous
        (only when ambig=toss)."""
        B = batch.size
        self.reads_in += B
        hits, ids = kmerset.scan_batch(self.ks, batch.bases)
        out = np.full(B, -1, np.int32)
        if hits.shape[1] == 0:
            return out
        nrefs = max(1, len(self.names))
        for i in range(B):
            row = ids[i][ids[i] >= 0]
            if len(row) < self.min_kmer_hits:
                continue
            counts = np.bincount(row, minlength=nrefs)
            top = int(counts.argmax())
            ties = int((counts == counts[top]).sum())
            if ties > 1 and self.ambig == "toss":
                out[i] = -2
                continue
            out[i] = top
            self.reads_matched += 1
            self.reads_per_ref[top] += 1
            self.bases_per_ref[top] += int(batch.lengths[i])
        return out

    def stats_lines(self) -> List[str]:
        total_reads = max(1, self.reads_in)
        lines = ["#name\treads\treadsPct\tbases\trpkm"]
        for i, name in enumerate(self.names):
            r = int(self.reads_per_ref[i])
            if r == 0:
                continue
            rpkm = (r * 1e9 / (max(1, self.ref_lengths[i])
                               * total_reads))
            lines.append(f"{name}\t{r}\t"
                         f"{100.0 * r / total_reads:.4f}%\t"
                         f"{int(self.bases_per_ref[i])}\t{rpkm:.4f}")
        return lines


def main(argv: List[str]) -> int:
    args = Args.parse(argv)
    in1 = args.get("in", "in1") or (args.positional[0]
                                    if args.positional else None)
    ref = args.get("ref")
    pattern = args.get("pattern", "basename")
    outm = args.get("outm")
    outu = args.get("outu")
    stats = args.get("stats", "refstats")
    k = args.get_int("k", default=31)
    hdist = args.get_int("hdist", default=0)
    mkh = args.get_int("minkmerhits", "mkh", default=1)
    ambig = args.get("ambiguous", "ambig", default="first")
    if in1 is None or ref is None:
        print("Usage: seal in=<reads> ref=<refs.fa> stats=<file> "
              "[pattern=out_%.fq]", file=sys.stderr)
        return 1
    seqs, names = [], []
    for path in ref.split(","):
        for rec in fastx.read_seqs(path):
            seqs.append(rec.bases)
            names.append(rec.id.split()[0])
    seal = Seal(seqs, names, k=k, hdist=hdist, min_kmer_hits=mkh,
                ambig=ambig)
    per_ref_fh: Dict[int, object] = {}
    outm_fh = fastx.xopen(outm, "wb") if outm else None
    outu_fh = fastx.xopen(outu, "wb") if outu else None

    def wfq(fh, rec):
        if fh is None:
            return
        q = rec.quality if rec.quality is not None \
            else b"I" * len(rec.bases)
        fh.write(b"@" + rec.id.encode() + b"\n" + rec.bases + b"\n+\n"
                 + q + b"\n")

    for chunk in batched(fastx.read_seqs(in1), 8192):
        b = ReadBatch.from_records(chunk)
        assign = seal.assign_batch(b)
        for i, rec in enumerate(chunk):
            a = int(assign[i])
            if a >= 0:
                wfq(outm_fh, rec)
                if pattern and "%" in pattern:
                    if a not in per_ref_fh:
                        safe = names[a].replace("/", "_")
                        per_ref_fh[a] = fastx.xopen(
                            pattern.replace("%", safe), "wb")
                    wfq(per_ref_fh[a], rec)
            else:
                wfq(outu_fh, rec)
    for fh in per_ref_fh.values():
        fh.close()
    for fh in (outm_fh, outu_fh):
        if fh is not None:
            fh.close()
    if stats:
        with open(stats, "w") as fh:
            fh.write("\n".join(seal.stats_lines()) + "\n")
    sys.stderr.write(
        f"Reads:\t{seal.reads_in}\nMatched:\t{seal.reads_matched}\t"
        f"({100.0*seal.reads_matched/max(1,seal.reads_in):.2f}%)\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
