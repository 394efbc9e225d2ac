"""mappacbio: long-read (PacBio/Nanopore-era) mapping mode.

reference: align2/BBMapPacBio.java:24 + sh/mapPacBio.sh. Long-read
defaults (reference setDefaults :47-69): k=12 index, minratio=0.46,
denser seeding, wider alignment padding, and reads longer than the
alignment envelope are split into chunks (reference: fastareadlen=6000,
sh/mapPacBio.sh:52; AbstractMapThread.processReadSplit:2787 rejoins —
chunks are mapped independently here, rejoin is a later milestone).
"""

from __future__ import annotations

import sys
from typing import List

from ..io import fastx
from ..utils.args import Args
from . import bbmap as bbmap_tool

MAX_CHUNK = 6000  # reference: PacBio stack envelope (ALIGN_ROWS=6020)


def split_long_reads(path: str, out_path: str,
                     chunk: int = MAX_CHUNK) -> None:
    """Pre-chunk reads longer than the alignment envelope
    (reference: sh/mapPacBio.sh fastareadlen)."""
    def gen():
        for rec in fastx.read_seqs(path, fake_quality=30):
            if len(rec.bases) <= chunk:
                yield rec
            else:
                for i, lo in enumerate(range(0, len(rec.bases), chunk)):
                    q = (rec.quality[lo:lo + chunk]
                         if rec.quality is not None else None)
                    yield fastx.SeqRecord(f"{rec.id}_chunk{i}",
                                          rec.bases[lo:lo + chunk], q,
                                          rec.numeric_id)
    fastx.write_fastq(out_path, gen())


def main(argv: List[str]) -> int:
    args = Args.parse(argv)
    in1 = args.get("in", "in1") or (args.positional[0]
                                    if args.positional else None)
    if in1 is None:
        print("Usage: mappacbio ref=<fasta> in=<reads> out=<sam>",
              file=sys.stderr)
        return 1
    import tempfile
    chunked = None
    # pre-split long reads
    needs_split = False
    for rec in fastx.read_seqs(in1, fake_quality=30):
        if len(rec.bases) > MAX_CHUNK:
            needs_split = True
        break
    fwd = [a for a in argv if not a.lower().startswith(("in=", "in1="))]
    if needs_split or True:
        tmp = tempfile.NamedTemporaryFile(suffix=".fq", delete=False)
        tmp.close()
        split_long_reads(in1, tmp.name)
        chunked = tmp.name
        fwd.append(f"in={chunked}")
    else:
        fwd.append(f"in={in1}")
    # long-read defaults (reference: BBMapPacBio.setDefaults)
    if not args.has("k", "keylen"):
        fwd.append("k=12")
    if not args.has("minratio") and not args.has("minid"):
        fwd.append("minratio=0.46")
    if not args.has("maxindel"):
        fwd.append("maxindel=400")
    if not args.has("batchsize"):
        fwd.append("batchsize=256")
    try:
        return bbmap_tool.main(fwd)
    finally:
        if chunked:
            import os
            os.unlink(chunked)


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
