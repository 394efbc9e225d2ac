"""rqcfilter/bbqc: chained production filtering pipeline.

reference: jgi/RQCFilter.java + jgi/BBQC.java + sh/rqcfilter.sh — chains
BBDuk stages by invoking tool mains in-process (the reference calls each
stage's main() inside one JVM): adapter ktrim -> quality/artifact filter
-> optional phiX/contaminant removal.
"""

from __future__ import annotations

import os
import sys
import tempfile
from typing import List

from ..utils.args import Args
from . import bbduk

DEFAULT_ADAPTERS = "/root/reference/resources/adapters.fa"
DEFAULT_PHIX = "/root/reference/resources/phix174_ill.ref.fa.gz"


def main(argv: List[str]) -> int:
    args = Args.parse(argv)
    in1 = args.get("in", "in1") or (args.positional[0]
                                    if args.positional else None)
    in2 = args.get("in2")
    out = args.get("out", "out1")
    out2 = args.get("out2")
    path = args.get("path", default=".")
    adapters = args.get("ref", "adapters", default=DEFAULT_ADAPTERS)
    phix = args.get("phixref", default=DEFAULT_PHIX)
    trimq = args.get_int("trimq", default=10)
    minlength = args.get_int("minlength", "ml", default=45)
    do_phix = args.get_bool("phix", "removephix", default=True)
    ktrim = args.get("ktrim", default="r")
    if in1 is None or out is None:
        print("Usage: rqcfilter in=<reads> [in2=] out=<clean> "
              "[ref=adapters.fa] [phix=t]", file=sys.stderr)
        return 1
    os.makedirs(path, exist_ok=True)
    tmp1 = os.path.join(path, "rqc_stage1.fq.gz")
    stats1 = os.path.join(path, "adapterStats.txt")
    stats2 = os.path.join(path, "phixStats.txt")

    # stage 1: adapter trim + quality trim (reference: RQCFilter ktrim
    # stage with mink/hdist/tbo)
    stage1 = [f"in={in1}", f"out={tmp1}", f"ref={adapters}",
              "k=23", "mink=11", "hdist=1", f"ktrim={ktrim}",
              f"qtrim=rl", f"trimq={trimq}", f"minlength={minlength}",
              f"stats={stats1}"]
    if in2:
        stage1.append(f"in2={in2}")
    rc = bbduk.main(stage1)
    if rc != 0:
        return rc
    # stage 2: phiX / contaminant removal (filter mode)
    if do_phix and phix and os.path.exists(phix):
        stage2 = [f"in={tmp1}", f"out={out}", f"ref={phix}",
                  "k=31", "hdist=1", f"stats={stats2}",
                  f"minlength={minlength}"]
        if out2:
            stage2.append(f"out2={out2}")
        rc = bbduk.main(stage2)
        try:
            os.unlink(tmp1)
        except OSError:
            pass
        return rc
    os.replace(tmp1, out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
