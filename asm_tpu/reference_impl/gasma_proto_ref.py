"""Scalar emulators of the reference's research-prototype greedy variants.

P7 "GASMA v1" (pymatch/algorithms/greedy.py:4-211) selects highways
GLOBALLY with a set-cover-style score, then links them front-to-back; P8
"GASMAShortsighted" (pymatch/algorithms/greedyShortsighted.py:4-163)
walks highways greedily with a bounded look-ahead `sight`, scoring each
candidate with a mini prototype-NW over the gap segment. Both sit on the
prototype HurdleMatrix (pymatch/util.py:76-288).

These emulators reproduce the ORIGINALS' behavior — including their
quirks, each marked with a [Qn] tag below — and are tested against the
originals themselves, imported from /root/reference with a one-function
gmpy shim (tests/test_gasma_prototypes.py):

  [Q1] util.py:201-208 _find_LSB is a 32-bit de Bruijn multiply: any
       first-bit index >= 32 aliases to 0, which the chunk loop
       (util.py:217-238) turns into 32-bit steps; highways longer than 32
       are emitted as chunks and re-merged by the crossHurdleThreshold
       pass.
  [Q2] greedy.py:70-76 scores candidate sets on a [1]*(m+1) bit-list
       zipped against length-n highway lists — zip() silently truncates
       to min(m+1, n) positions.
  [Q3] greedy.py:180-184 counts hurdles on the final leap-to-destination
       but DISCARDS the count (the expression's value is never added).
  [Q4] greedyShortsighted.py:108-116 advances the match cursors under a
       bare try/except: when dna1 runs out nothing advances; when only
       dna2 runs out, dna1's character was already appended but neither
       cursor moves.
  [Q5] util.py:105-130 __init__ never calls preprocessHurdleMatrix — the
       prototype matrices are NOT denoised (unlike the production C++
       flip_short_hurdles); only the crossHurdleThreshold merge smooths.

Coordinate conventions (util.py:116-130): row strings have n+1 columns;
column c of a row string sits at string index c, and the bignum bit for
column c is bit (n - c); every row begins with '1' (out-of-range compare)
so int round-trips never drop leading zeros.
"""

from __future__ import annotations


def _appendix_pad(dna1: str, dna2: str, threshold: int):
    """Sentinel padding (greedy.py:6-20): swap so dna1 is the shorter,
    then pad both with a character distinct from both first characters."""
    if len(dna1) > len(dna2):
        dna1, dna2 = dna2, dna1
    candidates = [c for c in "ACGT" if c != dna1[0]]
    if dna2[0] != dna1[0] and dna2[0] in candidates:
        candidates.remove(dna2[0])
    pad = candidates[0] * (threshold + 5)
    return pad + dna1 + pad, pad + dna2 + pad


def _row_string(dna1: str, dna2: str, shift: int) -> str:
    """One hurdle row (util.py:116-130 _get_hurdles, forward order):
    column c compares dna1[x-1] vs dna2[x-shift-1] for x walking the
    shifted range; out-of-range columns are '1'."""
    m, n = len(dna1), len(dna2)

    def cell(x):
        i, j = x, x - shift
        if not (1 <= i <= m) or not (1 <= j <= n):
            return "1"
        return "0" if dna1[i - 1] == dna2[j - 1] else "1"

    xs = range(shift, n + 1 + shift) if shift <= 0 else range(0, n + 1)
    return "".join(cell(x) for x in xs)


def _first_bit_32(value: int, find_zero: bool) -> int:
    """[Q1] the prototype's de Bruijn LSB finder: exact for indices < 32,
    aliases to 0 for indices >= 32 (util.py:201-208)."""
    isolated = (~value & (value + 1)) if find_zero else (value & (~value + 1))
    t = isolated.bit_length() - 1
    return t if 0 <= t < 32 else 0


def _extract_highways(row_int: int, shift: int, cross_threshold: int):
    """Highway (zero-run) extraction with 32-bit chunking [Q1] and the
    crossHurdleThreshold merge (util.py:210-288 _get_highway). Returns
    (shift, start, length, hurdles_crossed) tuples; start counts bits
    from the LSB (i.e. from the END of the row string)."""
    runs = []
    bits = row_int
    pos = 0
    while bits > 0:
        first_zero = _first_bit_32(bits, find_zero=True)
        pos += first_zero
        bits >>= first_zero
        if bits == 0:
            break
        first_one = _first_bit_32(bits, find_zero=False)
        if first_one == 0 and first_zero == 0:
            # [Q1] both scans aliased: consume a 32-bit chunk
            if not bits & 1:
                runs.append((pos, 32))
            bits >>= 32
            pos += 32
        else:
            runs.append((pos, first_one))
            pos += first_one
            bits >>= first_one

    merged = []
    cur = (0, 0)  # (start, length); the (shift, 0, 0) seed of the original
    hurdles: list[int] = []
    for start, length in runs:
        gap = start - (cur[0] + cur[1])
        if gap <= cross_threshold and length >= 2:
            hurdles += list(range(cur[0] + cur[1], start))
            cur = (cur[0], cur[1] + gap + length)
        else:
            merged.append((shift, cur[0], cur[1], hurdles))
            cur = (start, length)
            hurdles = []
    if cur != (0, 0):
        merged.append((shift, cur[0], cur[1], hurdles))
    return merged


class PrototypeHurdleMatrix:
    """pymatch.util.HurdleMatrix (util.py:76-288) on padded strings.

    Keeps both the row STRINGS (for the originals' format()-slice
    arithmetic) and the row ints (for highway extraction)."""

    def __init__(self, dna1: str, dna2: str, k: int, threshold: int,
                 cross_threshold: int):
        self.k = k
        self.m, self.n = len(dna1), len(dna2)
        self.rows = [
            _row_string(dna1, dna2, s) for s in range(-k, k + 1)
        ]
        self.row_ints = [int(r, 2) for r in self.rows]
        self.highways = [
            h
            for s in range(-k, k + 1)
            for h in _extract_highways(self.row_ints[s + k], s,
                                       cross_threshold)
            if h[2] >= threshold
        ]
        # matrixLength from row 0's formatted int (greedy.py:36) — always
        # n+1 because every row starts with '1'
        self.length = len(format(self.row_ints[0], "b"))

    def slice_ones(self, shift: int, col_hi: int, col_lo: int) -> int:
        """'1' count over format(row,'b')[length-col_hi : length-col_lo-1]
        — the originals' hurdle-crossing count (greedy.py:155-156)."""
        return self.rows[shift + self.k][
            self.length - col_hi: self.length - col_lo - 1
        ].count("1")

    def slice_len(self, shift: int, col_hi: int, col_lo: int) -> int:
        """len() of the same slice (greedyShortsighted.py:52)."""
        return len(self.rows[shift + self.k][
            self.length - col_hi: self.length - col_lo - 1
        ])


def _leap_forward_column(l_: int, l: int) -> int:
    """greedy.py:105-117 (the prototypes' own variant of
    switch_forward_column — NOT the C++ utils.h:587 one)."""
    if l_ == l:
        return 0
    if abs(l_) > abs(l) and l * l_ >= 0:
        return 0
    if abs(l_) < abs(l) and l * l_ >= 0:
        return abs(l - l_)
    return abs(l - l_) - abs(l_)


def _leap_penalty(l_: int, l: int) -> int:
    return 0 if l_ == l else abs(l_ - l)


def _proto_nw_score(s1: str, s2: str) -> float:
    """The prototype NW SCORE dp (pymatch/algorithms/NeedlemanWunsch.py:
    16-32): zero borders, +2 match / -1 mismatch / -1 gap, maximized;
    returns the matrix MAXIMUM (not the corner)."""
    m, n = len(s1), len(s2)
    best = 0.0
    prev = [0.0] * (n + 1)
    for i in range(1, m + 1):
        cur = [0.0] * (n + 1)
        for j in range(1, n + 1):
            diag = prev[j - 1] + (2.0 if s1[i - 1] == s2[j - 1] else -1.0)
            cur[j] = max(prev[j] - 1.0, cur[j - 1] - 1.0, diag)
            if cur[j] > best:
                best = cur[j]
        prev = cur
    return best


class GasmaV1Ref:
    """P7: global highway selection + front-to-back linking
    (pymatch/algorithms/greedy.py:4-211)."""

    def __init__(self, dna1: str, dna2: str, k: int, threshold: int = 3,
                 cross_hurdle_threshold: int = 1):
        dna1, dna2 = _appendix_pad(dna1, dna2, threshold)
        self.s1, self.s2 = dna1, dna2
        self.m, self.n = len(dna1), len(dna2)
        self.dest_lane = -abs(self.m - self.n)
        self.k = max(k, abs(self.m - self.n) + 5)
        self.matrix = PrototypeHurdleMatrix(
            dna1, dna2, self.k, threshold, cross_hurdle_threshold
        )
        self.threshold = threshold

    def _select_highways(self):
        """findBestHighways (greedy.py:68-102): greedily add the highway
        with the best marginal score = new zeros covered - 3 [Q2]."""
        window = min(self.m + 1, self.n)  # [Q2] zip truncation
        covered = [1] * window

        def gain(start, length):
            g = 0
            for p in range(start, min(start + length, window)):
                g += covered[p]
            return g

        chosen = []
        pool = list(self.matrix.highways)
        while pool:
            best_gain = float("-inf")
            best_idx = None
            for idx, (shift, start, length, _h) in enumerate(pool):
                # marginal score: zeros this highway newly covers - 3
                lg = gain(start, length) - 3
                if lg > best_gain or (
                    lg == best_gain and shift == self.dest_lane
                ):
                    best_gain = lg
                    best_idx = idx
            if best_gain < 0:
                break
            shift, start, length, hurdles = pool.pop(best_idx)
            for p in range(start, min(start + length, window)):
                covered[p] = 0
            chosen.append((shift, start, length, hurdles))
        return chosen

    def edit_distance(self) -> int:
        # highways re-keyed to (shift, END column, length, hurdles)
        # (greedy.py:45: start + length - 1)
        selected = [
            (shift, start + length - 1, length, hurdles)
            for shift, start, length, hurdles in self._select_highways()
        ]
        by_shift: dict[int, list] = {}
        for shift, end, length, hurdles in selected:
            by_shift.setdefault(shift, []).append((end, length, hurdles))
        for shift in by_shift:
            by_shift[shift].sort(key=lambda t: t[0], reverse=True)

        lane, col = 0, self.n
        remaining = len(selected)
        hurdle_cost = 0
        leap_cost = 0
        while remaining > 0:
            best_shift = None
            best_cross = float("inf")
            best_col_after = None
            for shift, items in by_shift.items():
                if not items:
                    continue
                col_after = col - _leap_forward_column(lane, shift)
                end, _length, hurdles = items[0]
                cross = self.matrix.slice_ones(shift, col_after, end)
                cross += sum(1 for h in hurdles if h < col_after)
                if cross < best_cross:
                    best_shift, best_cross = shift, cross
                    best_col_after = col_after
            if best_shift is None:
                break
            if best_cross > 0:
                hurdle_cost += best_cross
            leap_cost += _leap_penalty(lane, best_shift)
            end, length, _h = by_shift[best_shift].pop(0)
            remaining -= 1
            lane, col = best_shift, end - length + 1

        if (lane, col) != (self.dest_lane, 0):
            leap_cost += _leap_penalty(lane, self.dest_lane)
            # [Q3] the original computes the remaining hurdle count here
            # and throws it away — so neither do we add anything
        return leap_cost + hurdle_cost


class GasmaShortsightedRef:
    """P8: bounded look-ahead walk with mini-NW gap scoring
    (pymatch/algorithms/greedyShortsighted.py:4-163)."""

    def __init__(self, dna1: str, dna2: str, k: int, threshold: int = 3,
                 cross_hurdle_threshold: int = 1, sight: int = 3):
        base = GasmaV1Ref(dna1, dna2, k, threshold, cross_hurdle_threshold)
        self.m_ = base
        self.sight = sight
        # (shift, END column, length, hurdles), sorted by end desc
        self.highways = sorted(
            [
                (s, start + length - 1, length, h)
                for s, start, length, h in base.matrix.highways
            ],
            key=lambda t: t[1],
            reverse=True,
        )
        self.i = 0
        self.j = 0

    def _score(self, hw, lane, col):
        m_ = self.m_
        shift, end, length, hurdles = hw
        col_after = col - _leap_forward_column(lane, shift)
        leap_cost = 0  # the original zeroes this (greedyShortsighted.py:50)
        hurdle_cost = sum(1 for h in hurdles if h < col_after)
        way_len = m_.matrix.slice_len(shift, col_after, end)
        sub1 = m_.s1[self.i: self.i + way_len + max(0, -lane + shift)]
        sub2 = m_.s2[self.j: self.j + way_len + max(0, -shift + lane)]
        way_cost = _proto_nw_score(sub1, sub2)
        eff_len = min(col_after - (end - length + 1), length)
        score = eff_len - way_cost - hurdle_cost - leap_cost
        return score, leap_cost, hurdle_cost + way_cost, \
            col_after - (end - length + 1)

    def edit_distance(self):
        m_ = self.m_
        lane, col = 0, m_.n
        hurdle_cost = 0.0
        leap_cost = 0.0
        while self.highways:
            best_idx = 0
            best_score = float("-inf")
            _s0, lc0, hc0, len0 = self._score(self.highways[0], lane, col)
            best_cost = (lc0, hc0)
            best_len = len0
            for idx, hw in enumerate(self.highways):
                score, lc, hc, ln = self._score(hw, lane, col)
                beyond = (
                    col - _leap_forward_column(lane, hw[0]) - hw[1]
                    > self.sight
                )
                if beyond and best_score >= 0:
                    break  # bounded look-ahead
                if score > best_score or (
                    score == best_score and hw[0] == m_.dest_lane
                ):
                    best_idx = idx
                    best_score = score
                    best_cost = (lc, hc)
                    best_len = ln
            chosen = self.highways.pop(best_idx)
            leap_cost += best_cost[0]
            hurdle_cost += best_cost[1]

            # cursor bookkeeping feeding the next mini-NW [Q4]
            if chosen[0] < lane:
                self.j += abs(chosen[0] - lane)
            elif chosen[0] > lane:
                self.i += abs(chosen[0] - lane)
            for _ in range(max(0, int(best_len))):
                if self.i >= len(m_.s1):
                    continue  # dna1[i] raised: nothing advanced
                if self.j >= len(m_.s2):
                    continue  # dna2[j] raised after dna1 appended
                self.i += 1
                self.j += 1

            lane, col = chosen[0], chosen[1] - chosen[2] + 1

            while self.highways:
                nxt = self.highways[0]
                if nxt[1] - nxt[2] + 1 >= col - _leap_forward_column(
                    lane, nxt[0]
                ):
                    self.highways.pop(0)
                else:
                    break

        if (lane, col) != (m_.dest_lane, 0):
            leap_cost += _leap_penalty(lane, m_.dest_lane)
            col_after = col - _leap_forward_column(lane, m_.dest_lane)
            if col_after > 0:
                hurdle_cost += m_.matrix.slice_ones(
                    m_.dest_lane, col_after, 0
                )
        return leap_cost + hurdle_cost
