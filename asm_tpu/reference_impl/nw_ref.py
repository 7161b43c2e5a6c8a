"""Exact affine-gap global alignment (Needleman-Wunsch/Gotoh) — scalar oracle.

Replaces the reference's external parasail dependency
(GASMA/benchmark/benchmark_utils.h:104-150). Penalty convention pinned to the
reference benchmark's parasail setup:

  * scoring matrix parasail_matrix_create("ACGT", 0, -x): match scores 0,
    mismatch scores -x  (benchmark_utils.h:288)
  * parasail_nw_trace(s1, n1, s2, n2, o, e, matrix): a gap of length L
    costs o + (L-1)*e (parasail's "open includes the first extension"
    convention — consistent with switch_lane_penalty, GASMA/utils.h:576-579)
  * reported penalty = -score  (benchmark_utils.h:116)

So this module MINIMIZES penalty: mismatch x, gap open o (first gap char),
gap extend e per further char. The CIGAR uses parasail-style ops '=', 'X',
'I' (consumes s1/read), 'D' (consumes s2/ref), matching what
parasail_cigar_decode feeds into the coverage metric (benchmark_coverage.h:40-63).

Traceback tie-breaking is deterministic (prefer diagonal, then D, then I);
parasail's internal preference may differ, so coverage percentages are
comparable but not bit-identical to the reference README.
"""

from __future__ import annotations

import numpy as np

INF = 10**9


def nw_ref(
    s1: str,
    s2: str,
    x: int = 1,
    o: int = 1,
    e: int = 1,
    traceback: bool = True,
) -> tuple[int, str]:
    """Return (penalty, cigar). Penalty is non-negative."""
    m, n = len(s1), len(s2)
    # H[i][j]: best penalty aligning s1[:i] with s2[:j]
    H = np.full((m + 1, n + 1), INF, dtype=np.int64)
    E = np.full((m + 1, n + 1), INF, dtype=np.int64)  # gap in s2 (I: consume s1)
    F = np.full((m + 1, n + 1), INF, dtype=np.int64)  # gap in s1 (D: consume s2)
    H[0, 0] = 0
    for i in range(1, m + 1):
        E[i, 0] = o + (i - 1) * e
        H[i, 0] = E[i, 0]
    for j in range(1, n + 1):
        F[0, j] = o + (j - 1) * e
        H[0, j] = F[0, j]
    for i in range(1, m + 1):
        a = s1[i - 1]
        for j in range(1, n + 1):
            sub = H[i - 1, j - 1] + (0 if a == s2[j - 1] else x)
            E[i, j] = min(H[i - 1, j] + o, E[i - 1, j] + e)
            F[i, j] = min(H[i, j - 1] + o, F[i, j - 1] + e)
            H[i, j] = min(sub, E[i, j], F[i, j])
    penalty = int(H[m, n])
    if not traceback:
        return penalty, ""

    # traceback (prefer diagonal, then E/up/'I', then F/left/'D')
    ops: list[str] = []
    i, j = m, n
    state = "H"
    while i > 0 or j > 0:
        if state == "H":
            if i > 0 and j > 0 and H[i, j] == H[i - 1, j - 1] + (
                0 if s1[i - 1] == s2[j - 1] else x
            ):
                ops.append("=" if s1[i - 1] == s2[j - 1] else "X")
                i -= 1
                j -= 1
            elif i > 0 and H[i, j] == E[i, j]:
                state = "E"
            else:
                state = "F"
        elif state == "E":
            ops.append("I")
            if H[i - 1, j] + o == E[i, j]:
                state = "H"
            # else stay in E (extension)
            i -= 1
        else:  # F
            ops.append("D")
            if H[i, j - 1] + o == F[i, j]:
                state = "H"
            j -= 1
    ops.reverse()
    return penalty, _rle(ops)


def _rle(ops: list[str]) -> str:
    out = []
    i = 0
    while i < len(ops):
        j = i
        while j < len(ops) and ops[j] == ops[i]:
            j += 1
        out.append(f"{j - i}{ops[i]}")
        i = j
    return "".join(out)
