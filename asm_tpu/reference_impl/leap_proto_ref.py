"""Scalar emulator of the generalized LEAP prototype (P6 pluggable form).

Mirrors pymatch/algorithms/LEAP.py:4-199 — the research prototype with
PLUGGABLE cost hooks the production LV kernel hard-codes:

  * penalty(l_, l)  — energy to leap from lane l_ to lane l
    (leapLanePenalty, LEAP.py:50-61; default |l_-l| * hurdleCost, and
    hurdleCost for staying, i.e. crossing the next hurdle);
  * forward(l_, l, pos) — columns auto-advanced by the leap
    (leapForwardColumn, LEAP.py:64-79);
  * originLanes / destinationLanes — multi-origin / multi-destination
    dicts lane -> column (LEAP.py:34-38).

DP (editDistance, LEAP.py:127-156): start[l][e] = max over l_ of
end[l_][e - penalty(l_, l)] + forward(l_, l, start[l_][e-p]); end =
start + match-run length; converge when a destination lane's end reaches
its destination column - 1.

DOCUMENTED DIVERGENCE — the original is BROKEN outside toy inputs: its
match-run scan (verticesToHurdle, LEAP.py:105-117) indexes a 32-entry
de Bruijn table with ``((bit * 0x6EB14F9) >> 27)`` WITHOUT the 32-bit
wraparound the trick needs (contrast util.py:201-208 which applies
``% 32``), so any match run >= 6 raises IndexError. This emulator uses
an exact bit scan instead; tests/test_gasma_prototypes.py verifies
equality against the original on its working domain (hurdle-dense pairs)
and pins the crash boundary. A second quirk IS reproduced: a lane whose
remaining suffix is hurdle-free yields run length 0, not infinity
(bit-scan of an empty vector aliases to 0, LEAP.py:112-116), so progress
on clean lanes costs one energy per column.
"""

from __future__ import annotations

NEG_INF = float("-inf")


def default_penalty(hurdle_cost: int):
    def penalty(l_: int, l: int) -> int:
        return hurdle_cost if l_ == l else hurdle_cost * abs(l_ - l)
    return penalty


def default_forward(m: int):
    def forward(l_: int, l: int, pos) -> int:
        if l_ == l:
            return 1 if (pos is not None and pos < m) else 0
        if abs(l_) > abs(l) and l * l_ >= 0:
            return 0
        if abs(l_) < abs(l) and l * l_ >= 0:
            return abs(l - l_)
        return abs(l - l_) - abs(l_)
    return forward


class LeapGeneralizedRef:
    """pymatch.algorithms.LEAP with exact bit scans (see module doc)."""

    def __init__(self, dna1: str, dna2: str, k: int, E: int,
                 penalty=None, forward=None, origin_lanes=None,
                 destination_lanes=None, hurdle_cost: int = 1):
        if len(dna1) > len(dna2):
            dna1, dna2 = dna2, dna1
        self.s1, self.s2 = dna1, dna2
        self.m, self.n = len(dna1), len(dna2)
        self.k = k
        self.E = E
        self.penalty = penalty or default_penalty(hurdle_cost)
        self.forward = forward or default_forward(self.m)
        self.origins = {0: 0} if origin_lanes is None else origin_lanes
        self.dests = (
            {0: self.m} if destination_lanes is None else destination_lanes
        )
        # hurdle bit-vectors per lane (initHurdleVectors, LEAP.py:86-103):
        # bit p = 1 iff position p mismatches; out-of-range compares MATCH
        # (the original maps match(i, j) is None to '0')
        self.hurdles = []
        for lane in range(-k, k + 1):
            bits = 0
            xs = (range(lane + 1, self.m + 1 + lane) if lane <= 0
                  else range(1, self.m + 1))
            for p, x in enumerate(xs):
                i, j = x, x - lane
                if 1 <= i <= self.m and 1 <= j <= self.n:
                    if dna1[i - 1] != dna2[j - 1]:
                        bits |= 1 << p
            self.hurdles.append(bits)
        self.final_lane = None
        self.final_energy = None

    def _run_length(self, lane: int, position) -> int:
        """verticesToHurdle (LEAP.py:105-117) with an exact scan; keeps
        the original's edge cases: position >= m-1 -> 0, negative
        positions clamp to 0, hurdle-free suffix -> 0 (not infinity)."""
        if position >= self.m - 1:
            return 0
        pos = int(position) if position >= 0 else 0
        rest = self.hurdles[lane + self.k] >> pos
        if rest == 0:
            return 0  # quirk reproduced: empty vector scans to 0
        return (rest & -rest).bit_length() - 1

    def edit_distance(self) -> bool:
        k, E = self.k, self.E
        start = [[NEG_INF] * (E + 1) for _ in range(2 * k + 1)]
        end = [[NEG_INF] * (E + 1) for _ in range(2 * k + 1)]
        for l in range(-k, k + 1):
            if l in self.origins:
                start[l + k][0] = self.origins[l]
                end[l + k][0] = (
                    start[l + k][0] + self._run_length(l, start[l + k][0])
                )
        for e in range(1, E + 1):
            for l in range(-k, k + 1):
                for l_ in range(-k, k + 1):
                    e_ = e - self.penalty(l_, l)
                    if e_ >= 0:
                        src = end[l_ + k][e_]
                        if src == NEG_INF:
                            continue
                        cand = src + self.forward(l_, l, start[l_ + k][e_])
                        if cand > start[l + k][e]:
                            start[l + k][e] = min(cand, self.m)
                length = self._run_length(l, start[l + k][e]) \
                    if start[l + k][e] != NEG_INF else 0
                end[l + k][e] = start[l + k][e] + length
                if l in self.dests and end[l + k][e] >= self.dests[l] - 1:
                    self.final_lane = l
                    self.final_energy = e
                    return True
        return False
