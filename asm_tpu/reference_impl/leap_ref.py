"""Scalar emulator of the LEAP banded affine alignment (LV).

Mirrors GASMA/benchmark/LEAP_SIMD/LV_BAG.cpp: a banded Landau-Vishkin-style
wavefront over total_lanes = 2k+3 diagonals, where start[l][e] / end[l][e]
are the first/last coordinate reached on lane l with accumulated penalty e,
and I_pos/D_pos carry affine gap state (open vs extend, LV_BAG.cpp:166-182).

Coordinate system (count_ID_length, LV_BAG.cpp:9-23): pos = max(read index,
ref index); lane l < mid compares A[pos-(mid-l)] vs B[pos], lane l > mid
compares A[pos] vs B[pos-(l-mid)]; mid = gap_threshold + 1.

The run converges when any lane's match run reaches buffer_length =
max(len(read), len(ref)) (benchmark_utils.h:162,165); in ED_GLOBAL /
ED_SEMI_FREE_BEGIN modes a lane must also satisfy the lane-difference
correction e + o + (|mid-l|-1)*e' <= af_threshold, and among lanes converging
at the same energy the one with the smallest corrected value wins
(LV_BAG.cpp:220-238). The reported penalty is final_ED — the UNcorrected
energy (benchmark_utils.h:173).

Deviations (documented):
  * fresh state per pair — the reference reuses start/end/I/D arrays across
    pairs without clearing, so stale entries from earlier alignments can
    leak into later ones (LV::init allocates once, LV::reset only clears
    ED_pass, LV_BAG.cpp:122-125); we treat every slot not written this pair
    as unreachable (-2);
  * indices outside a string (before 0 or past its end) are deterministic
    mismatches instead of stale buffer bytes (LV_BAG.cpp:110-120 strncpy
    of `length` chars reads past the shorter string's end).
"""

from __future__ import annotations

from asm_tpu.config import LeapMode

UNREACHED = -2


def leap_ref(
    s1: str,
    s2: str,
    k: int = 3,
    af_threshold: int = 200,
    mode: LeapMode = LeapMode.GLOBAL,
    ms_penalty: int = 1,
    gap_open_penalty: int = 1,
    gap_ext_penalty: int = 1,
    max_len: int = 256,
):
    """Run LEAP; returns (passed, final_ED, final_lane_shift).

    final_lane_shift is final_lane_idx - mid (the diagonal offset).
    When not passed, final_ED is af_threshold + 1 (the reference would
    report a stale value from the previous pair; see module docstring).
    """
    total_lanes = 2 * k + 3
    mid = k + 1
    buffer_length = max(len(s1), len(s2))
    assert buffer_length <= max_len, "emulator does not model >max_len reads"
    go, ge, ms = gap_open_penalty, gap_ext_penalty, ms_penalty

    def char_a(i: int):
        if 0 <= i < len(s1):
            return s1[i]
        return ("PAD_A", i)  # never equals anything from B

    def char_b(i: int):
        if 0 <= i < len(s2):
            return s2[i]
        return ("PAD_B", i)

    def count_id_length(lane_idx: int, start_pos: int) -> int:
        # cf. LV::count_ID_length, LV_BAG.cpp:9-23
        a_off = mid - lane_idx if lane_idx < mid else 0
        b_off = lane_idx - mid if lane_idx > mid else 0
        pos = start_pos
        while pos < buffer_length and char_a(pos - a_off) == char_b(pos - b_off):
            pos += 1
        return pos

    E = af_threshold
    start = [[UNREACHED] * (E + 1) for _ in range(total_lanes)]
    end = [[UNREACHED] * (E + 1) for _ in range(total_lanes)]
    I_pos = [[UNREACHED] * (E + 1) for _ in range(total_lanes)]
    D_pos = [[UNREACHED] * (E + 1) for _ in range(total_lanes)]

    # cf. LV::init, LV_BAG.cpp:95-105
    for l in range(total_lanes):
        distance = abs(l - mid)
        if distance == 0 or mode in (LeapMode.LOCAL, LeapMode.SEMI_FREE_BEGIN):
            start[l][0] = distance

    passed = False
    final_lane = mid
    final_ed = E + 1
    converge = 1_000_000

    # cf. LV::run, LV_BAG.cpp:127-245
    for l in range(1, total_lanes - 1):
        if start[l][0] >= 0:
            end[l][0] = count_id_length(l, start[l][0])
            if end[l][0] == buffer_length:
                return True, 0, l - mid

    for e in range(1, E + 1):
        for l in range(1, total_lanes - 1):
            top = 1 if l >= mid else 0
            bot = 1 if l <= mid else 0

            end_up = end[l - 1][e - go] if e >= go else UNREACHED
            i_up = I_pos[l - 1][e - ge] if e >= ge else UNREACHED
            if e >= go and end_up >= 0 and end_up > i_up:
                I_pos[l][e] = end_up + top
            elif e >= ge and i_up >= 0:
                I_pos[l][e] = i_up + top

            end_dn = end[l + 1][e - go] if e >= go else UNREACHED
            d_dn = D_pos[l + 1][e - ge] if e >= ge else UNREACHED
            if e >= go and end_dn >= 0 and end_dn > d_dn:
                D_pos[l][e] = end_dn + bot
            elif e >= ge and d_dn >= 0:
                D_pos[l][e] = d_dn + bot

            s = UNREACHED
            if e >= ms and end[l][e - ms] >= 0:
                s = end[l][e - ms] + 1
            if I_pos[l][e] > s:
                s = I_pos[l][e]
            if D_pos[l][e] > s:
                s = D_pos[l][e]
            start[l][e] = s

            if s >= 0:
                end[l][e] = count_id_length(l, s)
                if end[l][e] == buffer_length:
                    if mode in (LeapMode.GLOBAL, LeapMode.SEMI_FREE_BEGIN):
                        lane_diff = abs(mid - l)
                        t = e
                        if lane_diff != 0:
                            t += go + (lane_diff - 1) * ge
                        if t <= E and t < converge:
                            final_lane = l
                            final_ed = e
                            passed = True
                            converge = t
                    else:
                        final_lane = l
                        final_ed = e
                        passed = True
        if passed:
            break

    return passed, final_ed, final_lane - mid
