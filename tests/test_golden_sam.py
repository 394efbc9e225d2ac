"""Byte-exact phiX paired-end SAM golden (VERDICT r3 #9): any drift in
seeding, retention, pairing, DP, rescue, MAPQ or tag emission fails
here at the byte level. Regenerate deliberately with
tests/golden/gen_phix_golden.py after an intentional change."""
import os
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, ".."))
RES = "/root/reference/resources"
GOLDEN = os.path.join(HERE, "golden", "phix_paired_golden.sam")


@pytest.mark.slow
def test_phix_paired_sam_byte_golden(tmp_path):
    if not os.path.exists(f"{RES}/phix174_ill.ref.fa.gz"):
        pytest.skip("bundled phiX resources unavailable")
    out = tmp_path / "mapped.sam"
    subprocess.run(
        [sys.executable, "-m", "bbmap_tpu", "bbmap",
         f"ref={RES}/phix174_ill.ref.fa.gz",
         f"in={RES}/sample1.fq.gz", f"in2={RES}/sample2.fq.gz",
         f"out={out}", "nodisk"],
        cwd=REPO, env=dict(os.environ, JAX_PLATFORMS="cpu"),
        check=True, timeout=900)
    got = out.read_bytes()
    want = open(GOLDEN, "rb").read()
    assert got == want, (
        "phiX SAM drifted from the golden — if the change is "
        "intentional, regenerate with tests/golden/gen_phix_golden.py")
