"""SAM-layer golden vectors: production io/sam.py vs the independent
line-literal Java transcription (tests/golden/gen_samline.py; VERDICT
r2 next-step #9). The vectors are committed; regenerate with
``python tests/golden/gen_samline.py``."""

import json
import os

import numpy as np
import pytest

from bbmap_tpu.io import sam as samio

HERE = os.path.dirname(os.path.abspath(__file__))
VEC = os.path.join(HERE, "golden", "samline_vectors.json")


@pytest.fixture(scope="module")
def vectors():
    with open(VEC) as fh:
        return json.load(fh)


def test_mapq_vectors(vectors):
    for v in vectors["mapq"]:
        got = samio.to_mapq(v["score"], v["length"], v["mapped"],
                            v["ambig"])
        assert got == v["want"], v


def test_cigar_vectors(vectors):
    old = samio.INTRON_LIMIT
    try:
        for v in vectors["cigar"]:
            samio.INTRON_LIMIT = v["intron"]
            m = v["match"].encode()
            got13 = samio.match_to_cigar(m, v["start"], v["stop"],
                                         v["reflen"], version=1.3)
            got14 = samio.match_to_cigar(m, v["start"], v["stop"],
                                         v["reflen"], version=1.4)
            assert got13 == v["want13"], v
            assert got14 == v["want14"], v
    finally:
        samio.INTRON_LIMIT = old


def test_md_vectors(vectors):
    cha = np.frombuffer(vectors["md_chrom"].encode(), np.uint8)
    old = samio.INTRON_LIMIT
    try:
        for v in vectors["md"]:
            samio.INTRON_LIMIT = v["intron"]
            got = samio.make_md_tag(
                v["match"].encode(), v["call"].encode(), cha,
                v["refstart"], v["scafloc"], v["scaflen"])
            assert got == v["want"], v
    finally:
        samio.INTRON_LIMIT = old
