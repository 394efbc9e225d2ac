"""Read statistics battery: histogram accumulators + report files.

reference: align2/ReadStats.java:19 — per-thread accumulators merged at
end; here one vectorized accumulator per process. Emits the reference's
machine-parsable artifact files (qhist/lhist/gchist/ihist/indelhist/
idhist/mhist), which are part of the tool contract
(reference: docs/UsageGuide.txt:277-283).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np


class ReadStats:
    def __init__(self, maxlen: int = 1024, maxq: int = 50,
                 max_insert: int = 2000):
        self.qhist_sum = np.zeros(maxlen, np.int64)   # per-position q sum
        self.qhist_cnt = np.zeros(maxlen, np.int64)
        self.lhist = np.zeros(maxlen + 1, np.int64)
        self.gchist = np.zeros(101, np.int64)
        self.ihist = np.zeros(max_insert + 1, np.int64)
        self.idhist = np.zeros(101, np.int64)
        self.indelhist = np.zeros(256, np.int64)
        self.mhist_m = np.zeros(maxlen, np.int64)     # match by position
        self.mhist_s = np.zeros(maxlen, np.int64)
        self.mhist_io = np.zeros(maxlen, np.int64)    # ins+other

    def add_batch(self, bases: np.ndarray, quality: Optional[np.ndarray],
                  lengths: np.ndarray) -> None:
        B, Lmax = bases.shape
        Lcap = min(Lmax, len(self.qhist_cnt))
        valid = np.arange(Lcap)[None, :] < lengths[:, None]
        if quality is not None:
            q = quality[:, :Lcap]
            self.qhist_sum[:Lcap] += np.where(valid, q, 0).sum(0)
            self.qhist_cnt[:Lcap] += valid.sum(0)
        np.add.at(self.lhist, np.minimum(lengths, len(self.lhist) - 1), 1)
        gc = ((bases[:, :Lcap] == ord("G")) |
              (bases[:, :Lcap] == ord("C"))) & valid
        at = ((bases[:, :Lcap] == ord("A")) |
              (bases[:, :Lcap] == ord("T"))) & valid
        denom = np.maximum(1, gc.sum(1) + at.sum(1))
        pct = np.clip((100.0 * gc.sum(1) / denom).round().astype(int),
                      0, 100)
        np.add.at(self.gchist, pct, 1)

    def add_insert(self, insert: int) -> None:
        if insert > 0:
            self.ihist[min(insert, len(self.ihist) - 1)] += 1

    def add_match(self, match: bytes) -> None:
        m = np.frombuffer(match, np.uint8)
        n = len(m)
        Lcap = min(n, len(self.mhist_m))
        mm = m[:Lcap]
        self.mhist_m[:Lcap] += mm == ord("m")
        self.mhist_s[:Lcap] += (mm == ord("S")) | (mm == ord("N"))
        self.mhist_io[:Lcap] += (mm == ord("I")) | (mm == ord("D")) | \
            (mm == ord("X")) | (mm == ord("Y"))
        subs = int((m == ord("S")).sum())
        dels = int((m == ord("D")).sum())
        inss = int((m == ord("I")).sum())
        self.indelhist[min(dels + inss, 255)] += 1
        ident = 100.0 * int((m == ord("m")).sum()) / max(1, n)
        self.idhist[int(np.clip(round(ident), 0, 100))] += 1

    # ---- writers (reference artifact formats) ----
    def write_qhist(self, path: str) -> None:
        with open(path, "w") as fh:
            fh.write("#BaseNum\tRead1_linear\n")
            nz = np.nonzero(self.qhist_cnt)[0]
            for i in nz:
                fh.write(f"{i}\t{self.qhist_sum[i]/self.qhist_cnt[i]:.3f}\n")

    def write_lhist(self, path: str) -> None:
        with open(path, "w") as fh:
            fh.write("#Length\tCount\n")
            for i in np.nonzero(self.lhist)[0]:
                fh.write(f"{i}\t{self.lhist[i]}\n")

    def write_gchist(self, path: str) -> None:
        with open(path, "w") as fh:
            fh.write("#GC\tCount\n")
            for i in np.nonzero(self.gchist)[0]:
                fh.write(f"{i}\t{self.gchist[i]}\n")

    def write_ihist(self, path: str) -> None:
        with open(path, "w") as fh:
            fh.write("#InsertSize\tCount\n")
            for i in np.nonzero(self.ihist)[0]:
                fh.write(f"{i}\t{self.ihist[i]}\n")

    def write_idhist(self, path: str) -> None:
        with open(path, "w") as fh:
            fh.write("#Identity\tReads\n")
            for i in np.nonzero(self.idhist)[0]:
                fh.write(f"{i}\t{self.idhist[i]}\n")

    def write_indelhist(self, path: str) -> None:
        with open(path, "w") as fh:
            fh.write("#Indels\tCount\n")
            for i in np.nonzero(self.indelhist)[0]:
                fh.write(f"{i}\t{self.indelhist[i]}\n")

    def write_mhist(self, path: str) -> None:
        with open(path, "w") as fh:
            fh.write("#BaseNum\tMatch\tSub\tIndelOther\n")
            tot = np.maximum(1, self.mhist_m + self.mhist_s
                             + self.mhist_io)
            nz = np.nonzero(self.mhist_m + self.mhist_s
                            + self.mhist_io)[0]
            for i in nz:
                fh.write(f"{i}\t{self.mhist_m[i]/tot[i]:.5f}\t"
                         f"{self.mhist_s[i]/tot[i]:.5f}\t"
                         f"{self.mhist_io[i]/tot[i]:.5f}\n")
