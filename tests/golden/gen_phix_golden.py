"""Regenerate the frozen phiX paired-end golden SAM
(phix_paired_golden.sam) — run DELIBERATELY after an intentional
behavioral change, never to paper over a regression:

    python tests/golden/gen_phix_golden.py

The golden is the full byte-exact CLI output of

    bbmap ref=<reference>/resources/phix174_ill.ref.fa.gz
          in=sample1.fq.gz in2=sample2.fq.gz nodisk

and anchors every surface at once: seeding, retention, pair boost, DP
escalation, traceback, rescue, clearzone/MAPQ, CIGAR/MD/NM emission
(VERDICT r3 #9 — the e2e truth-window asserts alone let byte-level
drift through)."""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, "..", ".."))
RES = "/root/reference/resources"
OUT = os.path.join(HERE, "phix_paired_golden.sam")

env = dict(os.environ, JAX_PLATFORMS="cpu")
subprocess.run(
    [sys.executable, "-m", "bbmap_tpu", "bbmap",
     f"ref={RES}/phix174_ill.ref.fa.gz",
     f"in={RES}/sample1.fq.gz", f"in2={RES}/sample2.fq.gz",
     f"out={OUT}", "nodisk"],
    cwd=REPO, env=env, check=True)
print(f"wrote {OUT}")
