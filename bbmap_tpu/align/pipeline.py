"""BBMap-class alignment pipeline: seed -> chain -> device DP -> select ->
traceback -> SAM.

Orchestration replacing the reference per-thread loop
(reference: align2/AbstractMapThread.java:387-640 processRead /
align2/BBMapThread.java:389-943). Stages:

1. seeding/chaining (align/seed.py) produces Candidate sites per read
2. candidate windows are bucketed by (read-rows, window-cols) and scored by
   the wavefront DP (ops/msa_jax.msa_score_batch) — the analog of
   msa.fillAndScoreLimited over each SiteScore
   (reference: align2/BBMapThread.scoreSlow:252-345)
3. per-read site selection with the reference's clearzone ambiguity model
   (reference: align2/BBMapThread.java:500-560)
4. winners only re-run through the full DP (msa_full_batch) and the
   traceback walk produces long-form match strings
   (reference: align2/MultiStateAligner11ts.traceback2)
5. host SAM emission (io/sam.py)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..core import constants as K
from ..core.batch import ReadBatch
from ..core.genome import Genome
from ..index.build import KmerIndex
from ..io import sam as samio
from ..ops import msa_jax, msa_ref
from . import seed

# reference defaults (align2/BBMap.java:44-63, align2/AbstractMapThread.java)
MIN_RATIO = 0.56
SLOW_ALIGN_PADDING = 4
MAX_PAIR_DIST = 32000
# clearzone model (reference: align2/BBMapThread.java:38-57,114-134)
CLEARZONEP = int(1.6 * K.POINTS_MATCH2)
CLEARZONE1 = int(2.0 * K.POINTS_MATCH2)
CLEARZONE1b = int(2.6 * K.POINTS_MATCH2)
CLEARZONE1c = int(4.6 * K.POINTS_MATCH2)
CLEARZONE3 = int(8.0 * K.POINTS_MATCH2)
CLEARZONE1e = 2 * K.POINTS_MATCH2 - K.POINTS_MATCH - K.POINTS_SUB + 1
CZ1B_CUTOFF_FLAT = 12 * K.POINTS_MATCH2
CZ1B_CUTOFF_SCALE = 0.97
CZ1C_CUTOFF_FLAT = 26 * K.POINTS_MATCH2
CZ1C_CUTOFF_SCALE = 0.92


@dataclass
class MappedRead:
    """Final per-read mapping result (the essentials of the reference's
    mapped Read, stream/Read.java)."""
    mapped: bool = False
    strand: int = 0
    chrom: int = 0          # 1-based chrom block
    start: int = 0          # 0-based chrom-local alignment start
    stop: int = 0           # 0-based chrom-local last ref base
    score: int = 0
    match: Optional[bytes] = None
    ambiguous: bool = False
    perfect: bool = False
    paired: bool = False    # proper-pair
    n_sites: int = 1


def clearzone_for(score: int, max_sw: int, perfect: bool) -> int:
    """reference: align2/BBMapThread.java:508-525."""
    if perfect:
        return CLEARZONEP
    cz1b_lim = max_sw * CZ1B_CUTOFF_SCALE - CZ1B_CUTOFF_FLAT
    cz1c_lim = max_sw * CZ1C_CUTOFF_SCALE - CZ1C_CUTOFF_FLAT
    if score > cz1b_lim:
        return int(((max_sw - score) * CLEARZONE1b
                    + (score - cz1b_lim) * CLEARZONE1)
                   / (max_sw - cz1b_lim))
    if score > cz1c_lim:
        return int(((cz1b_lim - score) * CLEARZONE1c
                    + (score - cz1c_lim) * CLEARZONE1b)
                   / (cz1b_lim - cz1c_lim))
    return CLEARZONE1c


def _bucket_pad(n: int) -> int:
    """Pad job counts to powers of two (min 16) to bound recompilation."""
    p = 16
    while p < n:
        p <<= 1
    return p


class BBMapAligner:
    def __init__(self, genome: Genome, index: KmerIndex,
                 min_ratio: float = MIN_RATIO,
                 max_candidates: int = 16,
                 chain_dist: int = 400,
                 ambig_mode: str = "best"):
        self.genome = genome
        self.index = index
        self.min_ratio = min_ratio
        self.max_candidates = max_candidates
        self.chain_dist = chain_dist
        self.ambig_mode = ambig_mode
        self.codes_ascii = self._genome_ascii()
        self.chrom_offsets = index.chrom_offsets

    def _genome_ascii(self) -> np.ndarray:
        """Concatenated genome as ASCII (for DP windows and traceback)."""
        from ..core.bases import codes_to_ascii
        return codes_to_ascii(self.index.genome_codes)

    # ---- window extraction ----
    def _window(self, start: int, length: int) -> np.ndarray:
        g = self.codes_ascii
        lo, hi = start, start + length
        lo_c, hi_c = max(lo, 0), min(hi, len(g))
        out = np.full(length, ord("N"), np.uint8)
        out[lo_c - lo:hi_c - lo] = g[lo_c:hi_c]
        return out

    def _chrom_of(self, flat_pos: int) -> Tuple[int, int]:
        """flat position -> (1-based chrom, chrom-local 0-based loc)."""
        c = int(np.searchsorted(self.chrom_offsets, flat_pos,
                                side="right")) - 1
        c = max(0, min(c, len(self.chrom_offsets) - 2))
        return c + 1, flat_pos - int(self.chrom_offsets[c])

    # ---- main entry ----
    def map_batch(self, batch: ReadBatch) -> List[MappedRead]:
        B = batch.size
        results = [MappedRead() for _ in range(B)]
        k = self.index.k

        # 1. seeding (host; device chain kernel is a later milestone)
        cand_by_read: List[List[seed.Candidate]] = []
        offs_cache: Dict[int, Optional[np.ndarray]] = {}
        for i in range(B):
            L = int(batch.lengths[i])
            if L < k:
                cand_by_read.append([])
                continue
            if L not in offs_cache:
                offs_cache[L] = seed.make_offsets(L, k)
            offsets = offs_cache[L]
            if offsets is None:
                cand_by_read.append([])
                continue
            keys = seed.keys_at_offsets(batch.bases[i], offsets, k)
            cand_by_read.append(seed.gather_candidates(
                self.index, offsets, keys, L, i,
                chain_dist=self.chain_dist,
                max_candidates=self.max_candidates))

        # 2. score all candidates with the wavefront DP, bucketed by (R, C)
        rc_cache: Optional[np.ndarray] = None
        jobs: List[Tuple[int, int, seed.Candidate, int, int]] = []
        # (read_idx, cand_idx, cand, window_start, C)
        for i, cands in enumerate(cand_by_read):
            L = int(batch.lengths[i])
            for ci, c in enumerate(cands):
                pad = SLOW_ALIGN_PADDING
                wstart = c.start - pad
                wlen = (c.stop - c.start + 1) + 2 * pad
                # round window length up within the R-bucket to limit
                # compilation count
                wlen = L + 2 * pad + _round_up(c.spread, 32)
                jobs.append((i, ci, c, wstart, wlen))

        scores = self._run_score_jobs(batch, jobs)
        jobs_by_read: Dict[int, List[Tuple[tuple, int]]] = {}
        for j, job in enumerate(jobs):
            jobs_by_read.setdefault(job[0], []).append((job, scores[j]))

        # 3. per-read selection with clearzone ambiguity
        winners: List[Tuple[int, seed.Candidate, int, int, int]] = []
        # (read_idx, cand, window_start, C, score)
        for i in range(B):
            L = int(batch.lengths[i])
            my = jobs_by_read.get(i)
            if not my:
                continue
            max_sw = K.max_quality(L)
            min_score = int(max_sw * self.min_ratio)
            # sort: score desc, then strand, then start (deterministic
            # tie-break, reference SiteScore comparator semantics)
            my.sort(key=lambda t: (-t[1], t[0][2].strand, t[0][2].start))
            (ri, ci, cand, wstart, wlen), best = my[0]
            if best < min_score:
                continue
            perfect = best >= max_sw
            ambiguous = False
            if len(my) > 1:
                cz = clearzone_for(best, max_sw, perfect)
                second = my[1][1]
                if best - second < cz:
                    ambiguous = True
            res = results[i]
            res.score = int(best)
            res.perfect = perfect
            res.ambiguous = ambiguous
            res.n_sites = sum(1 for t in my if t[1] >= min_score)
            if ambiguous and self.ambig_mode == "toss":
                continue
            res.mapped = True
            res.strand = cand.strand
            winners.append((i, cand, wstart, wlen, int(best)))

        # 4. traceback for winners
        self._traceback_winners(batch, winners, results)
        return results

    def _read_for(self, batch: ReadBatch, i: int, strand: int) -> np.ndarray:
        L = int(batch.lengths[i])
        row = batch.bases[i, :L]
        if strand == 0:
            return row
        from ..core.bases import COMP_ASCII
        return COMP_ASCII[row][::-1]

    def _run_score_jobs(self, batch, jobs) -> List[int]:
        buckets: Dict[Tuple[int, int], List[int]] = {}
        for j, (i, ci, c, wstart, wlen) in enumerate(jobs):
            L = int(batch.lengths[i])
            buckets.setdefault((L, wlen), []).append(j)
        out = [0] * len(jobs)
        for (R, C), idxs in buckets.items():
            n = len(idxs)
            np_pad = _bucket_pad(n)
            reads = np.full((np_pad, R), ord("N"), np.uint8)
            refs = np.full((np_pad, C), ord("N"), np.uint8)
            for slot, j in enumerate(idxs):
                i, ci, c, wstart, wlen = jobs[j]
                reads[slot] = self._read_for(batch, i, c.strand)
                refs[slot] = self._window(wstart, C)
            s, col, st = msa_jax.msa_score_batch(reads, refs, R, C)
            s = np.asarray(s)
            for slot, j in enumerate(idxs):
                out[j] = int(s[slot])
        return out

    def _traceback_winners(self, batch, winners, results) -> None:
        buckets: Dict[Tuple[int, int], List[int]] = {}
        for w, (i, c, wstart, wlen, score) in enumerate(winners):
            L = int(batch.lengths[i])
            buckets.setdefault((L, wlen), []).append(w)
        for (R, C), idxs in buckets.items():
            np_pad = _bucket_pad(len(idxs))
            reads = np.full((np_pad, R), ord("N"), np.uint8)
            refs = np.full((np_pad, C), ord("N"), np.uint8)
            for slot, w in enumerate(idxs):
                i, c, wstart, wlen, score = winners[w]
                reads[slot] = self._read_for(batch, i, c.strand)
                refs[slot] = self._window(wstart, C)
            waves, s, col, st = msa_jax.msa_full_batch(reads, refs, R, C)
            waves = np.asarray(waves)
            s = np.asarray(s)
            col = np.asarray(col)
            st = np.asarray(st)
            for slot, w in enumerate(idxs):
                i, c, wstart, wlen, score = winners[w]
                packed = msa_jax.waves_to_packed(waves[slot], R, C)
                match = msa_ref.traceback(
                    reads[slot], refs[slot], packed, R, int(col[slot]),
                    int(st[slot]))
                ref_consumed = sum(1 for ch in match if ch in b"mSDN-")
                flat_start = wstart + int(col[slot]) - ref_consumed
                flat_stop = wstart + int(col[slot]) - 1
                chrom, loc = self._chrom_of(flat_start)
                res = results[i]
                res.match = match
                res.chrom = chrom
                res.start = loc
                res.stop = loc + (flat_stop - flat_start)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# SAM emission for a mapped batch
# ---------------------------------------------------------------------------

def emit_sam(genome: Genome, batch: ReadBatch,
             results: List[MappedRead],
             results2: Optional[List[MappedRead]] = None,
             batch2: Optional[ReadBatch] = None) -> List[str]:
    """Build SAM lines for a batch (and its mate batch if paired).
    reference: stream/SamLine.java:82-412 constructor semantics."""
    lines: List[str] = []
    paired_input = results2 is not None
    B = batch.size
    for i in range(B):
        r1, r2 = results[i], (results2[i] if paired_input else None)
        b1, b2 = batch, (batch2 if paired_input else None)
        proper = _properly_paired(genome, r1, r2) if paired_input else False
        if proper:
            r1.paired = r2.paired = True
        lines.append(_one_sam_line(genome, b1, i, r1, r2, 0, paired_input,
                                   proper))
        if paired_input:
            lines.append(_one_sam_line(genome, b2, i, r2, r1, 1,
                                       paired_input, proper))
    return lines


def _properly_paired(genome, r1, r2) -> bool:
    """Innie orientation on the same scaffold within MAX_PAIR_DIST
    (reference: docs/guides/BBMapGuide.txt:70, AbstractMapThread pairing)."""
    if r1 is None or r2 is None or not (r1.mapped and r2.mapped):
        return False
    if r1.chrom != r2.chrom or r1.strand == r2.strand:
        return False
    s1, _ = genome.locate(r1.chrom, r1.start)
    s2, _ = genome.locate(r2.chrom, r2.start)
    if s1.sid != s2.sid:
        return False
    if r1.strand == 0:
        inner = r2.start - r1.stop
    else:
        inner = r1.start - r2.stop
    return inner <= MAX_PAIR_DIST


def _one_sam_line(genome, b, i, r, mate, fragnum, paired_input,
                  proper) -> str:
    L = int(b.lengths[i])
    seq = bytes(b.bases[i, :L])
    qual = None
    if b.quality is not None:
        qual = bytes((b.quality[i, :L].astype(np.int16) + 33)
                     .astype(np.uint8))
    qname = b.ids[i]
    if paired_input and len(qname) > 2:
        c = qname[-2]
        num = ord(qname[-1]) - ord("1")
        if num in (0, 1) and c in (" ", "/"):
            qname = qname[:-2]
    qname = qname.replace("\t", "_")

    flag = samio.make_flag(r.mapped, mate.mapped if mate else None,
                           r.strand, mate.strand if mate else None,
                           paired_input, fragnum, proper)
    rname = "*"
    pos = 0
    cigar = "*"
    mapq = 0
    tags: List[str] = []
    scaf = None
    a1 = b1 = 0
    scaflen = 0
    if r.mapped:
        scaf, a1 = genome.locate(r.chrom, r.start)
        b1 = a1 + (r.stop - r.start)
        scaflen = scaf.length
        rname = scaf.name
        clip = samio.count_leading_clip(r.match or b"")
        clipped_indels = samio.count_leading_indels(a1, r.match)
        pos = max(1, a1 + 1 + clip + clipped_indels)
        mapq = samio.to_mapq(r.score, L, True, r.ambiguous)
        inbounds = a1 >= 0 and b1 < scaflen
        if r.match is not None:
            if (samio.VERSION > 1.3 and inbounds and r.perfect
                    and all(ch == ord("m") for ch in r.match)):
                cigar = f"{L}="
            else:
                cigar = samio.match_to_cigar(r.match, a1, b1, scaflen)
        if r.ambiguous:
            tags.append("XT:A:R")
        if samio.MAKE_NM_TAG and r.match is not None:
            nm = 0 if r.perfect else samio.calc_nm(r.match, cigar, L)
            tags.append(f"NM:i:{nm}")
        if samio.MAKE_AM_TAG:
            if mate is None:
                am = mapq
            elif mate.mapped:
                am = min(mapq, max(1, mate.score // max(1, L)))
            else:
                am = 0
            tags.append(f"AM:i:{am}")

    # mate fields
    rnext = "*"
    pnext = 0
    tlen = 0
    if paired_input and mate is not None:
        mate_scaf = None
        pos0_mate = 0
        if mate.mapped:
            mate_scaf, a2 = genome.locate(mate.chrom, mate.start)
            clip2 = samio.count_leading_clip(mate.match or b"")
            ci2 = samio.count_leading_indels(a2, mate.match)
            pos0_mate = max(1, a2 + 1 + clip2 + ci2)
        if r.mapped and mate.mapped:
            same = scaf is not None and mate_scaf is not None and \
                scaf.sid == mate_scaf.sid
            rnext = "=" if same else (mate_scaf.name if mate_scaf else "*")
            pnext = pos0_mate
            if same:
                # reference: tlen = 1 + (max(pos1, pos1_mate) -
                # min(pos0, pos0_mate)) in 1-based coords
                # (stream/SamLine.java:228-232)
                pos1 = a1 + 1 + (r.stop - r.start)
                pos1_mate = a2 + 1 + (mate.stop - mate.start)
                tlen = 1 + max(pos1, pos1_mate) - min(pos, pnext)
                # sign (reference: stream/SamLine.java:345-352)
                r_start_flat = (r.chrom, r.start)
                m_start_flat = (mate.chrom, mate.start)
                if (r_start_flat < m_start_flat or
                        (r_start_flat == m_start_flat and fragnum == 0)):
                    pass
                else:
                    tlen = -tlen
        elif r.mapped and not mate.mapped:
            rnext = "="
            pnext = pos
        elif not r.mapped and mate.mapped:
            rname_m = mate_scaf.name if mate_scaf else "*"
            rnext = "="
            pos = pos0_mate
            pnext = pos0_mate
            rname = rname_m
    return samio.SamRecord(
        qname=qname, flag=flag, rname=rname, pos=pos, mapq=mapq,
        cigar=cigar, rnext=rnext, pnext=pnext, tlen=tlen, seq=seq,
        qual=qual, tags=tags).to_line()
