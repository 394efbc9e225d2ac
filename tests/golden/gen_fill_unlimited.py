"""Golden-vector generator: an INDEPENDENT, deliberately line-literal
transcription of the reference DP (VERDICT r1 #3 / weak #5 — the
production oracle `bbmap_tpu/ops/msa_ref.py` must not be validated only
against itself).

This file transcribes, statement by statement with the Java control
flow preserved (scalar loops, same variable names, same operator
order), from:

- align2/MultiStateAligner11ts.java:2387-2436  (constants)
- align2/MultiStateAligner11ts.java:2477-2530  (affine arrays)
- align2/MultiStateAligner11ts.java:84-110     (matrix init)
- align2/MultiStateAligner11ts.java:623-866    (fillUnlimited)
- align2/MultiStateAligner11ts.java:1102-1232  (traceback2)

It imports NOTHING from bbmap_tpu — two independent transcriptions of
the same Java are exceedingly unlikely to share a transcription slip,
which is what the committed vectors guard against. Run from the repo
root:

    python tests/golden/gen_fill_unlimited.py

to (re)generate fill_unlimited_vectors.json. The vectors are committed;
regeneration must be a no-op unless this transcription changes.
"""

import json
import os

import numpy as np

I = np.int32  # all arithmetic in Java int32 wraparound semantics


def i32(x):
    """Python int -> Java int32 (two's-complement wraparound)."""
    return I(((int(x) & 0xFFFFFFFF) ^ 0x80000000) - 0x80000000)

# --- constants: MultiStateAligner11ts.java:2387-2436 ---
TIMEBITS = I(11)
SCOREBITS = I(32 - 11)
MAX_TIME = I((1 << 11) - 1)
MAX_SCORE = I(((1 << (32 - 11 - 1)) - 1) - 2000)
MIN_SCORE = I(0) - MAX_SCORE
SCOREOFFSET = TIMEBITS
TIMEMASK = i32(~((-1) << 11))
SCOREMASK = i32((~((-1) << (32 - 11))) << 11)

MODE_MS = 0
MODE_DEL = 1
MODE_INS = 2

POINTS_NOREF = I(0)
POINTS_NOCALL = I(0)
POINTS_MATCH = I(70)
POINTS_MATCH2 = I(100)
POINTS_SUB = I(-127)
POINTS_SUBR = I(-147)
POINTS_SUB2 = I(-51)
POINTS_SUB3 = I(-25)
POINTS_INS = I(-395)
POINTS_INS2 = I(-39)
POINTS_INS3 = I(-23)
POINTS_INS4 = I(-8)
POINTS_DEL = I(-472)
POINTS_DEL2 = I(-33)
POINTS_DEL3 = I(-9)
POINTS_DEL4 = I(-1)
POINTS_DEL5 = I(-1)
POINTS_DEL_REF_N = I(-10)
GAPCOST = I(64)          # Shared.java GAPCOST=Tools.max(1, GAPLEN/64)
GAPLEN = I(128)          # Shared.java GAPLEN (128); GAPCOST=max(1,128/64)=2
POINTS_GAP = I(0) - I(2)
GAPC = ord('-')

TIMESLIP = I(4)
MASK5 = TIMESLIP - 1
BARRIER_I1 = I(2)
BARRIER_D1 = I(3)
LIMIT_FOR_COST_3 = I(5)
LIMIT_FOR_COST_4 = I(20)
LIMIT_FOR_COST_5 = I(80)

BAD = MIN_SCORE - I(1)

sl = lambda v, s: i32(int(v) << int(s))  # Java <<
POINTSoff_NOCALL = sl(POINTS_NOCALL, SCOREOFFSET)
POINTSoff_MATCH = sl(POINTS_MATCH, SCOREOFFSET)
POINTSoff_MATCH2 = sl(POINTS_MATCH2, SCOREOFFSET)
POINTSoff_SUB = sl(POINTS_SUB, SCOREOFFSET)
POINTSoff_SUBR = sl(POINTS_SUBR, SCOREOFFSET)
POINTSoff_SUB2 = sl(POINTS_SUB2, SCOREOFFSET)
POINTSoff_SUB3 = sl(POINTS_SUB3, SCOREOFFSET)
POINTSoff_INS = sl(POINTS_INS, SCOREOFFSET)
POINTSoff_INS2 = sl(POINTS_INS2, SCOREOFFSET)
POINTSoff_INS3 = sl(POINTS_INS3, SCOREOFFSET)
POINTSoff_INS4 = sl(POINTS_INS4, SCOREOFFSET)
POINTSoff_DEL = sl(POINTS_DEL, SCOREOFFSET)
POINTSoff_DEL2 = sl(POINTS_DEL2, SCOREOFFSET)
POINTSoff_DEL3 = sl(POINTS_DEL3, SCOREOFFSET)
POINTSoff_DEL4 = sl(POINTS_DEL4, SCOREOFFSET)
POINTSoff_DEL5 = sl(POINTS_DEL5, SCOREOFFSET)
POINTSoff_DEL_REF_N = sl(POINTS_DEL_REF_N, SCOREOFFSET)
POINTSoff_GAP = sl(POINTS_GAP, SCOREOFFSET)
BADoff = sl(BAD, SCOREOFFSET)

# --- affine arrays: :2477-2530 ---
POINTSoff_INS_ARRAY = np.zeros(604, I)
for i in range(1, 604):
    if i > LIMIT_FOR_COST_4:
        ptsoff = POINTSoff_INS4
    elif i > LIMIT_FOR_COST_3:
        ptsoff = POINTSoff_INS3
    elif i > 1:
        ptsoff = POINTSoff_INS2
    else:
        ptsoff = POINTSoff_INS
    POINTSoff_INS_ARRAY[i] = ptsoff

POINTSoff_SUB_ARRAY = np.zeros(604, I)
for i in range(1, 604):
    if i > LIMIT_FOR_COST_3:
        ptsoff = POINTSoff_SUB3
    elif i > 1:
        ptsoff = POINTSoff_SUB2
    else:
        ptsoff = POINTSoff_SUB
    POINTSoff_SUB_ARRAY[i] = ptsoff


def is_fully_defined(c):
    # dna/AminoAcid.isFullyDefined: ACGTU upper/lower
    return chr(c).upper() in "ACGTU"


def fill_unlimited(read, ref):
    """:623-866. read/ref: bytes. Returns (packed, [rows,maxCol,maxState,
    maxScore])."""
    rows = len(read)
    columns = len(ref)
    refStartLoc = 0

    # constructor init :84-110
    packed = np.zeros((3, rows + 1, columns + 1), I)
    for matrix in range(3):
        for i in range(1, rows + 1):
            for j in range(columns + 1):
                packed[matrix][i][j] |= BADoff
        for i in range(0, rows + 1):
            prevScore = I(0) if i < 2 else packed[matrix][i - 1][0]
            score = prevScore + POINTSoff_INS_ARRAY[i]
            packed[matrix][i][0] = score

    maxGain = I(rows - 1) * POINTSoff_MATCH2 + POINTSoff_MATCH
    subfloor = I(0) - I(2) * maxGain
    BARRIER_I2 = I(rows) - BARRIER_I1
    BARRIER_I2b = I(columns - 1)
    BARRIER_D2 = I(rows) - BARRIER_D1

    for row in range(1, rows + 1):
        for col in range(1, columns + 1):
            call0 = ord('?') if row < 2 else read[row - 2]
            call1 = read[row - 1]
            ref0 = ord('!') if col < 2 else ref[refStartLoc + col - 2]
            ref1 = ref[refStartLoc + col - 1]

            match = (call1 == ref1 and ref1 != ord('N'))
            prevMatch = (call0 == ref0 and ref0 != ord('N'))
            gap = (ref1 == GAPC)

            if gap:
                packed[MODE_MS][row][col] = subfloor
            else:
                scoreFromDiag = packed[MODE_MS][row - 1][col - 1] & SCOREMASK
                scoreFromDel = packed[MODE_DEL][row - 1][col - 1] & SCOREMASK
                scoreFromIns = packed[MODE_INS][row - 1][col - 1] & SCOREMASK
                streak = packed[MODE_MS][row - 1][col - 1] & TIMEMASK

                if match:
                    scoreMS = scoreFromDiag + (
                        POINTSoff_MATCH2 if prevMatch else POINTSoff_MATCH)
                    scoreD = scoreFromDel + POINTSoff_MATCH
                    scoreI = scoreFromIns + POINTSoff_MATCH
                    if scoreMS >= scoreD and scoreMS >= scoreI:
                        score = scoreMS
                        time = (streak + 1) if prevMatch else 1
                    elif scoreD >= scoreI:
                        score = scoreD
                        time = 1
                    else:
                        score = scoreI
                        time = 1
                    if time > MAX_TIME:
                        time = MAX_TIME - MASK5
                    packed[MODE_MS][row][col] = score | time
                else:
                    if ref1 != ord('N') and call1 != ord('N'):
                        scoreMS = scoreFromDiag + (
                            (POINTSoff_SUBR if streak <= 1 else POINTSoff_SUB)
                            if prevMatch
                            else POINTSoff_SUB_ARRAY[streak + 1])
                    else:
                        scoreMS = scoreFromDiag + POINTSoff_NOCALL
                    scoreD = scoreFromDel + POINTSoff_SUB
                    scoreI = scoreFromIns + POINTSoff_SUB
                    if scoreMS >= scoreD and scoreMS >= scoreI:
                        score = scoreMS
                        time = 1 if prevMatch else streak + 1
                    elif scoreD >= scoreI:
                        score = scoreD
                        time = 1
                    else:
                        score = scoreI
                        time = 1
                    if time > MAX_TIME:
                        time = MAX_TIME - MASK5
                    packed[MODE_MS][row][col] = score | time

            if row < BARRIER_D1 or row > BARRIER_D2:
                packed[MODE_DEL][row][col] = subfloor
            else:
                streak = packed[MODE_DEL][row][col - 1] & TIMEMASK
                scoreFromDiag = packed[MODE_MS][row][col - 1] & SCOREMASK
                scoreFromDel = packed[MODE_DEL][row][col - 1] & SCOREMASK
                scoreMS = scoreFromDiag + POINTSoff_DEL
                scoreD = scoreFromDel + (
                    POINTSoff_DEL if streak == 0 else
                    POINTSoff_DEL2 if streak < LIMIT_FOR_COST_3 else
                    POINTSoff_DEL3 if streak < LIMIT_FOR_COST_4 else
                    POINTSoff_DEL4 if streak < LIMIT_FOR_COST_5 else
                    (POINTSoff_DEL5 if (streak & MASK5) == 0 else I(0)))
                if ref1 == ord('N'):
                    scoreMS += POINTSoff_DEL_REF_N
                    scoreD += POINTSoff_DEL_REF_N
                elif gap:
                    scoreMS += POINTSoff_GAP
                    scoreD += POINTSoff_GAP
                if scoreMS >= scoreD:
                    score = scoreMS
                    time = 1
                else:
                    score = scoreD
                    time = streak + 1
                if time > MAX_TIME:
                    time = MAX_TIME - MASK5
                packed[MODE_DEL][row][col] = score | time

            if gap or (row < BARRIER_I1 and col > 1) or \
                    (row > BARRIER_I2 and col < BARRIER_I2b):
                packed[MODE_INS][row][col] = subfloor
            else:
                streak = packed[MODE_INS][row - 1][col] & TIMEMASK
                scoreFromDiag = packed[MODE_MS][row - 1][col] & SCOREMASK
                scoreFromIns = packed[MODE_INS][row - 1][col] & SCOREMASK
                scoreMS = scoreFromDiag + POINTSoff_INS
                scoreI = scoreFromIns + POINTSoff_INS_ARRAY[streak + 1]
                if scoreMS >= scoreI:
                    score = scoreMS
                    time = 1
                else:
                    score = scoreI
                    time = streak + 1
                if time > MAX_TIME:
                    time = MAX_TIME - MASK5
                packed[MODE_INS][row][col] = score | time

    maxCol = -1
    maxState = -1
    maxScore = -(2 ** 31)  # Integer.MIN_VALUE
    for state in range(3):
        for col in range(1, columns + 1):
            x = packed[state][rows][col] & SCOREMASK
            if x > maxScore:
                maxScore = int(x)
                maxCol = col
                maxState = state
    maxScore >>= int(SCOREOFFSET)
    return packed, [rows, maxCol, maxState, maxScore]


def traceback2(read, ref, packed, row, col, state):
    """:1102-1232 (GAPC expansion included). read/ref bytes."""
    refStartLoc = 0
    columns = len(ref)
    out = bytearray()
    gaps = 0
    while row > 0 and col > 0:
        time = packed[state][row][col] & TIMEMASK
        if state == MODE_MS:
            if time > 1:
                prev = state
            else:
                scoreFromDiag = packed[MODE_MS][row - 1][col - 1] & SCOREMASK
                scoreFromDel = packed[MODE_DEL][row - 1][col - 1] & SCOREMASK
                scoreFromIns = packed[MODE_INS][row - 1][col - 1] & SCOREMASK
                if scoreFromDiag >= scoreFromDel and \
                        scoreFromDiag >= scoreFromIns:
                    prev = MODE_MS
                elif scoreFromDel >= scoreFromIns:
                    prev = MODE_DEL
                else:
                    prev = MODE_INS
            c = read[row - 1]
            r = ref[refStartLoc + col - 1]
            if c == r:
                out.append(ord('m'))
            else:
                if not is_fully_defined(c):
                    out.append(ord('N'))
                elif not is_fully_defined(r):
                    out.append(ord('N'))
                else:
                    out.append(ord('S'))
            row -= 1
            col -= 1
        elif state == MODE_DEL:
            if time > 1:
                prev = state
            else:
                scoreFromDiag = packed[MODE_MS][row][col - 1] & SCOREMASK
                scoreFromDel = packed[MODE_DEL][row][col - 1] & SCOREMASK
                prev = MODE_MS if scoreFromDiag >= scoreFromDel else MODE_DEL
            r = ref[refStartLoc + col - 1]
            if r == GAPC:
                out.append(ord('-'))
                gaps += 1
            else:
                out.append(ord('D'))
            col -= 1
        else:
            if time > 1:
                prev = state
            else:
                scoreFromDiag = packed[MODE_MS][row - 1][col] & SCOREMASK
                scoreFromIns = packed[MODE_INS][row - 1][col] & SCOREMASK
                prev = MODE_MS if scoreFromDiag >= scoreFromIns else MODE_INS
            if col == 0:
                out.append(ord('X'))
            elif col >= columns:
                out.append(ord('Y'))
            else:
                out.append(ord('I'))
            row -= 1
        state = prev
    if col != row:
        while row > 0:
            out.append(ord('X'))
            row -= 1
            col -= 1
    out.reverse()
    if gaps == 0:
        return bytes(out)
    out3 = bytearray()
    for c in out:
        if c != GAPC:
            out3.append(c)
        else:
            out3.extend(b'D' * int(GAPLEN))
    return bytes(out3)


def make_cases():
    rng = np.random.default_rng(20260818)
    B = b"ACGT"

    def rand_seq(n):
        return bytes(B[i] for i in rng.integers(0, 4, size=n))

    cases = []

    def add(read, ref, tag):
        cases.append({"read": read.decode(), "ref": ref.decode(),
                      "tag": tag})

    # exact matches, varied lengths, padded windows
    for L in (5, 9, 17, 40, 75):
        g = rand_seq(L + 24)
        add(g[12:12 + L], g, f"exact_L{L}")
    # substitutions: single / adjacent pair (SUBR streak<=1) / triples
    for n_sub, tag in ((1, "sub1"), (2, "sub2adj"), (3, "sub3")):
        g = rand_seq(70)
        read = bytearray(g[10:60])
        if tag == "sub2adj":
            pos = [20, 21]
        else:
            pos = sorted(rng.choice(50, size=n_sub, replace=False))
        for p in pos:
            read[p] = B[(B.index(read[p]) + 1) % 4]
        add(bytes(read), g, tag)
    # sub at read start and end (streak boundary conditions)
    g = rand_seq(60)
    r = bytearray(g[5:45])
    r[0] = B[(B.index(r[0]) + 1) % 4]
    add(bytes(r), g, "sub_first")
    r = bytearray(g[5:45])
    r[-1] = B[(B.index(r[-1]) + 1) % 4]
    add(bytes(r), g, "sub_last")
    # insertion runs exercising every cost tier (1, 2, 5, 6, 20, 21, 30)
    for ins in (1, 2, 5, 6, 20, 21, 30):
        g = rand_seq(90)
        read = g[10:40] + rand_seq(ins) + g[40:60]
        add(read, g, f"ins{ins}")
    # deletion runs exercising every tier incl DEL5/MASK5 (1..100)
    for dl in (1, 2, 5, 6, 20, 21, 80, 81, 100):
        g = rand_seq(160 + dl)
        read = g[10:40] + g[40 + dl:90 + dl]
        add(read, g, f"del{dl}")
    # N handling: N in read, N in ref, N under deletion
    g = rand_seq(60)
    r = bytearray(g[10:50])
    r[15] = ord('N')
    add(bytes(r), g, "read_N")
    g2 = bytearray(rand_seq(60))
    g2[25] = ord('N')
    add(bytes(g2[10:50]), bytes(g2), "ref_N")
    # read overhangs window (X/Y tips)
    g = rand_seq(30)
    add(rand_seq(6) + g[:24], g, "left_overhang")
    add(g[6:] + rand_seq(6), g, "right_overhang")
    # gap-compressed ref (GAPC columns, POINTS_GAP in DEL state)
    g = rand_seq(140)
    gref = g[10:40] + bytes([GAPC]) * 3 + g[100:130]
    read = g[20:40] + g[100:120]
    add(read, gref, "gapc")
    # random fuzz pairs (short)
    for t in range(12):
        L = int(rng.integers(8, 30))
        C = L + int(rng.integers(0, 20))
        add(rand_seq(L), rand_seq(C), f"fuzz{t}")
    # combined sub+indel
    g = rand_seq(120)
    read = bytearray(g[10:40] + g[47:77])
    read[5] = B[(B.index(read[5]) + 1) % 4]
    read[40] = B[(B.index(read[40]) + 1) % 4]
    add(bytes(read), g, "sub_del_mix")
    return cases


def main():
    cases = make_cases()
    out = []
    for case in cases:
        read = case["read"].encode()
        ref = case["ref"].encode()
        packed, ret = fill_unlimited(read, ref)
        match = traceback2(read, ref, packed, ret[0], ret[1], ret[2])
        out.append({
            "tag": case["tag"], "read": case["read"], "ref": case["ref"],
            "rows": ret[0], "maxCol": ret[1], "maxState": ret[2],
            "maxScore": ret[3], "match": match.decode(),
        })
    path = os.path.join(os.path.dirname(__file__),
                        "fill_unlimited_vectors.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {len(out)} vectors to {path}")


if __name__ == "__main__":
    main()
