"""Scalar emulator of the profile-profile alignment prototype.

Mirrors pymatch/algorithms/MSA.py (ProfileProfileAlignment): PSSM column
frequencies over the 5-letter alphabet A,C,G,T,'-' (:4-13, :47-57), score
matrix match=1 / mismatch=-2 with gap-vs-gap 0 (:30-38), PSP profile dot
product (:59-69), and the maximizing DP with match > insert > delete
tie-break (:71-97). Returns (score_matrix_corner, D, B) instead of
printing.
"""

from __future__ import annotations

import numpy as np

GAP_VEC = np.array([0, 0, 0, 0, 1], dtype=np.float64)
_PSSM = {
    "A": np.array([1, 0, 0, 0, 0], dtype=np.float64),
    "C": np.array([0, 1, 0, 0, 0], dtype=np.float64),
    "G": np.array([0, 0, 1, 0, 0], dtype=np.float64),
    "T": np.array([0, 0, 0, 1, 0], dtype=np.float64),
    "-": GAP_VEC,
}


def score_matrix(match: float = 1.0, mismatch: float = -2.0) -> np.ndarray:
    s = np.full((5, 5), mismatch)
    for i in range(4):
        s[i, i] = match
    s[4, 4] = 0.0
    return s


def create_pssm(alignment: list[str]) -> np.ndarray:
    """Column frequency profile float64[L, 5] (MSA.py:47-57)."""
    L = len(alignment[0])
    pssm = np.zeros((L, 5))
    for i in range(L):
        for row in alignment:
            pssm[i] += _PSSM[row[i]]
        pssm[i] /= pssm[i].sum()
    return pssm


def profile_align_ref(a1: list[str], a2: list[str],
                      match: float = 1.0, mismatch: float = -2.0):
    """Returns (final_score, D, B) where B holds 'M'/'I'/'D' pointers
    (prototype's '\\ ', '|', '-')."""
    p1 = create_pssm(a1)
    p2 = create_pssm(a2)
    S = score_matrix(match, mismatch)
    L1, L2 = p1.shape[0], p2.shape[0]

    def psp(i, j):
        v1 = p1[i] if i is not None else GAP_VEC
        v2 = p2[j] if j is not None else GAP_VEC
        return float(v1 @ S @ v2)

    D = np.zeros((L1 + 1, L2 + 1))
    B = np.full((L1 + 1, L2 + 1), "", dtype=object)
    for i in range(L1):
        D[i + 1, 0] = D[i, 0] + psp(i, None)
        B[i + 1, 0] = "I"
    for j in range(L2):
        D[0, j + 1] = D[0, j] + psp(None, j)
        B[0, j + 1] = "D"
    for i in range(L1):
        for j in range(L2):
            m = D[i, j] + psp(i, j)
            ins = D[i, j + 1] + psp(i, None)
            dele = D[i + 1, j] + psp(None, j)
            D[i + 1, j + 1] = max(m, ins, dele)
            if D[i + 1, j + 1] == m:
                B[i + 1, j + 1] = "M"
            elif D[i + 1, j + 1] == ins:
                B[i + 1, j + 1] = "I"
            else:
                B[i + 1, j + 1] = "D"
    return float(D[L1, L2]), D, B
