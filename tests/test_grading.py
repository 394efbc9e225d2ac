"""Round-trip accuracy test: randomreads -> bbmap -> gradesam
(the reference's own quality harness, SURVEY.md §4 item 2)."""

import numpy as np
import pytest

from bbmap_tpu.align.pipeline import BBMapAligner, emit_sam
from bbmap_tpu.core.batch import ReadBatch
from bbmap_tpu.core.genome import build_genome
from bbmap_tpu.index.build import analyze_index, build_index
from bbmap_tpu.tools.gradesam import cigar_spans, parse_custom
from bbmap_tpu.tools.randomreads import RandomReads

PHIX = "/root/reference/resources/phix174_ill.ref.fa.gz"


def test_parse_custom():
    t = parse_custom("7_chr1_1_9979_10078_1979_gi|123|name with spaces")
    assert t == (1, 1, 9979, 10078, 1979, "gi|123|name with spaces")


def test_cigar_spans():
    assert cigar_spans("100=") == (0, 100, 0, 100)
    assert cigar_spans("5S90=5S") == (5, 90, 5, 100)
    assert cigar_spans("40=3D57=") == (0, 100, 0, 97)
    assert cigar_spans("40=2I58=") == (0, 98, 0, 100)


@pytest.mark.slow
def test_roundtrip_accuracy(tmp_path):
    g = build_genome(PHIX)
    idx = build_index(g, 13)
    analyze_index(idx, 0.0)
    aligner = BBMapAligner(g, idx)
    rr = RandomReads(g, seed=42, max_snps=2, snp_rate=0.5,
                     max_deletions=2, del_rate=0.2,
                     max_insertions=2, ins_rate=0.2)
    recs = list(rr.single(120, 100))
    batch = ReadBatch.from_records(recs)
    res = aligner.map_batch(batch)
    mapped = strict = 0
    for rec, r in zip(recs, res):
        truth = parse_custom(rec.id)
        assert truth is not None
        tchrom, tstrand, tstart, tstop, trel, tname = truth
        if not r.mapped:
            continue
        mapped += 1
        if r.strand != tstrand or r.chrom != tchrom:
            continue
        # compare unclipped chrom-coordinate extents, thresh 20 (loose)
        if abs(r.start - tstart) <= 20 or abs(r.stop - tstop) <= 20:
            strict += 1
    assert mapped >= 110
    assert strict >= mapped - 3
