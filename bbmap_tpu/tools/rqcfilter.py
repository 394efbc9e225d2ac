"""rqcfilter/bbqc: JGI production filtering pipeline.

reference: jgi/RQCFilter.java (2,352 LoC) + jgi/BBQC.java +
sh/rqcfilter.sh. Chains tool stages in-process (the reference invokes
each stage's class inside one JVM, RQCFilter.java:480 process()):

  1. adapter ktrim      (doTrim,   RQCFilter.ktrim:839)
  2. artifact filter    (doFilter, RQCFilter.filter:1000 — synthetic
                         contaminants + optional phiX/pJET)
  3. ribo removal       (riboFlag, RQCFilter.filterRibo:1100)
  4. nextera LMP split  (doNextera, RQCFilter.splitNextera:1193)
  5. bbmerge ihist      (doMerge,  RQCFilter.merge:1290)
  6. khist              (doKhist,  RQCFilter.khist)

Library presets (library=frag|lfpe|clip|clrs, RQCFilter.java:390-399,
:902-925) pick the trim reference: frag = fragment adapters (+tbo/tpe
when ktrim=r), lfpe/clrs = linker references, clip = short literal
linker with k=min(literal), mm=f, hdist=0.

Artifacts reproduced (RQCFilter.java:466-553, :805):
  <path>/file-list.txt    output-file manifest
  <path>/status.log       timestamped per-stage start/finish lines
  <path>/reproduce.sh     equivalent standalone shell commands
  <path>/filterStats.txt  reads/bases remaining after each stage
  per-stage bbduk stats   (adapterStats / filterStats_scaffolds / ...)
"""

from __future__ import annotations

import os
import sys
import time
from typing import List, Optional

from ..io import fastx
from ..utils.args import Args
from . import bbduk

RESOURCES = "/root/reference/resources"
DEFAULT_ADAPTERS = f"{RESOURCES}/adapters.fa"
DEFAULT_PHIX = f"{RESOURCES}/phix174_ill.ref.fa.gz"
DEFAULT_LFPE_LINKER = f"{RESOURCES}/nextera_LMP_linker.fa.gz"
DEFAULT_CLRS_LINKER = f"{RESOURCES}/nextera_LMP_adapter.fa.gz"
DEFAULT_CLIP_LINKER = "GGTTCATCGTCAGG"   # reference clipLinker default
DEFAULT_ARTIFACTS = f"{RESOURCES}/phix_adapters.fa.gz"


class _Pipeline:
    def __init__(self, path: str, argv: List[str], log_name: str,
                 file_list: str, reproduce: str):
        self.path = path
        self.log_path = os.path.join(path, log_name)
        self.file_list_path = os.path.join(path, file_list)
        self.reproduce_path = os.path.join(path, reproduce)
        os.makedirs(path, exist_ok=True)
        with open(self.log_path, "w") as fh:
            fh.write(self._stamp("start") + "\n")
        # reproduce header (reference: writeReproduceHeader)
        with open(self.reproduce_path, "w") as fh:
            fh.write("#!/bin/bash\n")
            fh.write("#bbmap_tpu rqcfilter\n")
            fh.write("#The steps below recapitulate the output of "
                     "RQCFilter when run like this:\n")
            fh.write("#rqcfilter " + " ".join(argv) + "\n\n")
        self.stage_stats: List[str] = []

    def _stamp(self, msg: str) -> str:
        return time.strftime("%Y-%m-%dT%H:%M:%S") + "\t" + msg

    def log(self, msg: str):
        with open(self.log_path, "a") as fh:
            fh.write(self._stamp(msg) + "\n")

    def reproduce(self, tool: str, tool_args: List[str]):
        with open(self.reproduce_path, "a") as fh:
            fh.write(f"{tool} " + " ".join(tool_args) + "\n")

    def write_file_list(self, entries: List[str]):
        with open(self.file_list_path, "w") as fh:
            fh.write("\n".join(entries) + ("\n" if entries else ""))

    def remaining(self, stage: str, path1: str,
                  path2: Optional[str] = None):
        reads = bases = 0
        for p in (path1, path2):
            if not p or not os.path.exists(p):
                continue
            for rec in fastx.read_seqs(p):
                reads += 1
                bases += len(rec.bases)
        self.log(f"#Remaining:\t{reads} reads\t{bases} bases")
        self.stage_stats.append(f"{stage}\t{reads}\t{bases}")
        return reads, bases


def main(argv: List[str]) -> int:
    args = Args.parse(argv)
    in1 = args.get("in", "in1") or (args.positional[0]
                                    if args.positional else None)
    in2 = args.get("in2")
    out = args.get("out", "out1")
    out2 = args.get("out2")
    path = args.get("path", default=".")
    library = (args.get("library", "lib", default="frag") or
               "frag").lower()
    adapters = args.get("ref", "adapters", "fragadapter",
                        default=DEFAULT_ADAPTERS)
    artifacts = args.get("artifactdb", "artifacts",
                         default=DEFAULT_ARTIFACTS)
    riboref = args.get("ribodb", "riboref")
    phix = args.get("phixref", default=DEFAULT_PHIX)
    trimq = args.get_int("trimq", default=10)
    qtrim = args.get("qtrim", default="rl")
    minlength = args.get_int("minlength", "ml", default=45)
    maq = args.get_int("maq", default=0)
    maxns = args.get_int("maxns", default=-1)
    ftm = args.get_int("forcetrimmod", "ftm", default=0)
    trim_k = args.get_int("trimk", default=23)
    filter_k = args.get_int("filterk", default=31)
    mink = args.get_int("mink", default=11)
    hdist_trim = args.get_int("trimhdist", default=1)
    hdist_filter = args.get_int("filterhdist", default=1)
    do_trim = args.get_bool("trimflag", "ktrimflag", default=True)
    do_filter = args.get_bool("filterflag", "filter", default=True)
    do_phix = args.get_bool("phix", "removephix", default=True)
    do_ribo = args.get_bool("ribo", default=False)
    do_nextera = args.get_bool("nextera", "nexteralmp", default=False)
    ihist = args.get("ihist")
    do_khist = args.get_bool("khist", default=False)
    ktrim = args.get("ktrim", default="r")
    tbo = args.get_bool("tbo", default=True)
    tpe = args.get_bool("tpe", default=True)
    if in1 is None or out is None:
        print("Usage: rqcfilter in=<reads> [in2=] out=<clean> "
              "path=<outdir> [library=frag|lfpe|clip|clrs] [phix=t] "
              "[ribo=f ribodb=<ref>] [nextera=f] [ihist=<file>]",
              file=sys.stderr)
        return 1
    if library not in ("frag", "lfpe", "clip", "clrs"):
        print(f"Unknown library type {library}", file=sys.stderr)
        return 1

    pipe = _Pipeline(path, argv, "status.log", "file-list.txt",
                     "reproduce.sh")
    out_in_path = os.path.join(path, out) if os.sep not in out else out
    out2_in_path = (os.path.join(path, out2)
                    if out2 and os.sep not in out2 else out2)

    # stage plan (reference: numSteps accounting, RQCFilter.java:616)
    steps = []
    if do_trim:
        steps.append("trim")
    if do_filter:
        steps.append("filter")
    if do_ribo and riboref:
        steps.append("ribo")
    if do_nextera:
        steps.append("nextera")

    cur1, cur2 = in1, in2
    rc = 0
    for i, stage in enumerate(steps):
        last = i == len(steps) - 1
        if stage == "nextera":
            break           # terminal stage handled below
        nxt1 = out_in_path if last else os.path.join(
            path, f"rqc_{stage}.fq.gz")
        nxt2 = out2_in_path if last else None
        sargs = [f"in={cur1}", f"out={nxt1}"]
        if cur2 and cur1 == in1:
            sargs.append(f"in2={cur2}")
        if nxt2:
            sargs.append(f"out2={nxt2}")
        if stage == "trim":
            pipe.log("ktrim start")
            # library presets pick the trim reference and special
            # flags (reference: RQCFilter.java:902-925)
            if library == "frag":
                sargs += [f"ref={adapters}", f"ktrim={ktrim}",
                          f"k={trim_k}", f"mink={mink}",
                          f"hdist={hdist_trim}"]
                if ktrim == "r":
                    if tbo:
                        sargs.append("tbo")
                    if tpe:
                        sargs.append("tpe")
            elif library == "lfpe":
                sargs += [f"ref={DEFAULT_LFPE_LINKER}",
                          f"ktrim={ktrim}", f"k={trim_k}",
                          f"mink={mink}", f"hdist={hdist_trim}"]
            elif library == "clrs":
                sargs += [f"ref={DEFAULT_CLRS_LINKER}",
                          f"ktrim={ktrim}", f"k={trim_k}",
                          f"mink={mink}", f"hdist={hdist_trim}"]
            elif library == "clip":
                # short literal linker: k = literal length, exact
                # match only (reference: RQCFilter.java:907-924)
                lit = args.get("cliplinker",
                               default=DEFAULT_CLIP_LINKER)
                sargs += [f"literal={lit}", f"ktrim={ktrim}",
                          f"k={min(len(x) for x in lit.split(','))}",
                          "mm=f", "hdist=0"]
            sargs += [f"qtrim={qtrim}", f"trimq={trimq}",
                      f"minlength={minlength}"]
            if ftm > 0:
                sargs.append(f"ftm={ftm}")
            sargs.append(
                f"stats={os.path.join(path, 'adapterStats.txt')}")
        elif stage == "filter":
            pipe.log("filter start")
            refs = []
            if artifacts and os.path.exists(artifacts):
                refs.append(artifacts)
            if do_phix and phix and os.path.exists(phix):
                refs.append(phix)
            if not refs:
                pipe.log("filter skip (no references present)")
                if last:
                    import shutil
                    shutil.copyfile(cur1, nxt1)
                    if cur2 and nxt2:
                        shutil.copyfile(cur2, nxt2)
                    cur1, cur2 = nxt1, nxt2
                continue
            sargs += [f"ref={','.join(refs)}", f"k={filter_k}",
                      f"hdist={hdist_filter}",
                      f"minlength={minlength}",
                      f"stats={os.path.join(path, 'filterStats_scaffolds.txt')}"]
            if maq > 0:
                sargs.append(f"maq={maq}")
            if maxns >= 0:
                sargs.append(f"maxns={maxns}")
        elif stage == "ribo":
            pipe.log("ribo start")
            sargs += [f"ref={riboref}", "k=31",
                      f"hdist={args.get_int('ribohdist', default=0)}",
                      f"minlength={minlength}",
                      f"stats={os.path.join(path, 'riboStats.txt')}"]
        pipe.reproduce("bbduk", sargs)
        rc = bbduk.main(sargs)
        if rc != 0:
            pipe.log(f"{stage} failed")
            return rc
        pipe.remaining(stage, nxt1, nxt2)
        pipe.log(("ktrim" if stage == "trim" else stage) + " finish")
        if cur1 not in (in1, in2) and os.path.exists(cur1):
            os.unlink(cur1)
        cur1, cur2 = nxt1, nxt2

    file_list = []
    if do_nextera:
        # terminal Nextera LMP split (reference: splitNextera:1193 —
        # output name set derived from the raw name)
        pipe.log("splitNextera start")
        from .pairtools import splitnexteralmp
        base = os.path.basename(out)
        stem = base[:-len(".fq.gz")] if base.endswith(".fq.gz") \
            else base.rsplit(".", 1)[0]
        lmp = os.path.join(path, stem + ".lmp.fq.gz")
        frag = os.path.join(path, stem + ".frag.fq.gz")
        unk = os.path.join(path, stem + ".unknown.fq.gz")
        single = os.path.join(path, stem + ".singleton.fq.gz")
        nstats = os.path.join(path, "nexteraStats.txt")
        nargs = [f"in={cur1}", f"out={lmp}", f"outf={frag}",
                 f"outu={unk}", f"outs={single}", f"stats={nstats}",
                 f"minlen={minlength}"]
        if cur2:
            nargs.insert(1, f"in2={cur2}")
        pipe.reproduce("splitnexteralmp", nargs)
        rc = splitnexteralmp(nargs)
        if rc != 0:
            pipe.log("splitNextera failed")
            return rc
        pipe.remaining("nextera", lmp)
        pipe.log("splitNextera finish")
        file_list += [f"lmp={os.path.basename(lmp)}",
                      f"frag={os.path.basename(frag)}",
                      f"unknown={os.path.basename(unk)}",
                      f"singleton={os.path.basename(single)}"]
        if cur1 not in (in1, in2) and os.path.exists(cur1):
            os.unlink(cur1)
    else:
        if not steps:
            # no stages: pass input through
            import shutil
            shutil.copyfile(in1, out_in_path)
        file_list.append(f"filtered_fastq={os.path.basename(out)}")
        if out2:
            file_list.append(
                f"filtered_fastq_2={os.path.basename(out2)}")

    # insert-size histogram via bbmerge (reference: merge:1290)
    if ihist and cur2 is None and in2 is None and not do_nextera:
        pipe.log("merge skip (unpaired input)")
    elif ihist:
        pipe.log("merge start")
        from . import bbmerge
        ih = ihist if os.sep in ihist else os.path.join(path, ihist)
        src1 = cur1 if not do_nextera else in1
        margs = [f"in={src1}", f"ihist={ih}"]
        if cur2 or in2:
            margs.insert(1, f"in2={cur2 or in2}")
        pipe.reproduce("bbmerge", margs)
        try:
            bbmerge.main(margs)
            file_list.append(f"ihist={os.path.basename(ih)}")
        except Exception as e:   # merge failure is non-fatal
            pipe.log(f"merge failed ({type(e).__name__}: {e})")
        pipe.log("merge finish")

    if do_khist:
        pipe.log("khist start")
        from . import kmercountexact
        kh = os.path.join(path, "khist.txt")
        pk = os.path.join(path, "peaks.txt")
        kargs = [f"in={cur1}", f"khist={kh}", f"peaks={pk}", "k=31"]
        pipe.reproduce("kmercountexact", kargs)
        try:
            kmercountexact.main(kargs)
            file_list += [f"khist={os.path.basename(kh)}",
                          f"peaks={os.path.basename(pk)}"]
        except Exception as e:
            pipe.log(f"khist failed ({type(e).__name__}: {e})")
        pipe.log("khist finish")

    # combined per-stage stats (reference: rqcStats, RQCFilter.java:805)
    with open(os.path.join(path, "filterStats.txt"), "w") as fh:
        fh.write("#Stage\tReadsRemaining\tBasesRemaining\n")
        fh.write("\n".join(pipe.stage_stats)
                 + ("\n" if pipe.stage_stats else ""))
    pipe.write_file_list(file_list)
    pipe.log("finish")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
