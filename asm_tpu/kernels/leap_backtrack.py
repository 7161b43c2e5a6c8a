"""Host-side LEAP backtrack: energy-history tables -> edit list + CIGAR.

Mirrors LV::backtrack (GASMA/benchmark/LEAP_SIMD/LV_BAG.cpp:250-354): walk
(lane, energy) from (final_lane, final_ED) down to energy 0, at each probe
deciding whether the wavefront start came from an insertion chain (I_pos),
a deletion chain (D_pos), or a mismatch, emitting one edit + the match-run
length consumed before it. In ED_GLOBAL / ED_SEMI_FREE_BEGIN modes the
|mid - final_lane| lane-correction gaps are prepended (LV_BAG.cpp:254-264).

Deviation (documented): the reference's get_CIGAR (LV_BAG.cpp:360-383)
contains a literal bug — it prints ED_info[0].id_length for EVERY run
(`sprintf(buffer, "%d", ED_info[0].id_length)` inside the loop, :377) and
stores the terminal match run at index ED_probe instead of ED_count
(:352-353). This module renders the CIGAR the backtrack list actually
describes: per-edit id_lengths, terminal run included. The edit LIST
(types in order) matches the reference exactly.

Backtracking is inherently per-pair pointer chasing over tiny [af+1, TL]
tables; the tables are produced batched on device
(leap_align(..., want_history=True)) and walked here on host.
"""

from __future__ import annotations

import numpy as np

from asm_tpu.config import AlignConfig, LeapMode

MISMATCH = "M"
A_INS = "I"
B_INS = "D"


def leap_backtrack_one(
    start: np.ndarray,  # int32[af+1, TL] (energy-major)
    end: np.ndarray,
    i_pos: np.ndarray,
    d_pos: np.ndarray,
    final_ed: int,
    final_lane_idx: int,
    cfg: AlignConfig,
) -> list[tuple[str, int]]:
    """One pair's edit list [(op, id_length, is_open), ...] in backtrack
    order.

    id_length = match-run consumed AFTER this edit (reading forward);
    is_open marks the gap-OPENING step of an affine chain (cost o) vs an
    extension (cost e) — the C++ ED_INFO does not record this, but the
    walker knows it unambiguously and affine penalties cannot be
    reconstructed from the list without it. The list ends with the
    terminal run as ('', n, False) like ED_info[0].
    """
    mid = cfg.k + 1
    go, ge, ms = cfg.o, cfg.e, cfg.x
    edits: list[tuple[str, int]] = []

    if cfg.leap_mode in (LeapMode.GLOBAL, LeapMode.SEMI_FREE_BEGIN):
        gap = B_INS if final_lane_idx > mid else A_INS
        for i in range(abs(mid - final_lane_idx)):
            edits.append((gap, 0, i == abs(mid - final_lane_idx) - 1))

    lane = int(final_lane_idx)
    e = int(final_ed)
    while e != 0:
        match_count = int(end[e, lane] - start[e, lane])
        pending = match_count
        if start[e, lane] == i_pos[e, lane]:
            # insertion chain: extends while the previous I_pos links up
            while True:
                top = 1 if lane >= mid else 0
                if (
                    e - ge >= 0
                    and i_pos[e - ge, lane - 1] != -2
                    and i_pos[e - ge, lane - 1] + top == i_pos[e, lane]
                ):
                    edits.append((A_INS, pending, False))  # extension (e)
                    pending = 0
                    lane -= 1
                    e -= ge
                else:
                    break
            edits.append((A_INS, pending, True))  # chain opener (o)
            lane -= 1
            e -= go
        elif start[e, lane] == d_pos[e, lane]:
            while True:
                bot = 1 if lane <= mid else 0
                if (
                    e - ge >= 0
                    and d_pos[e - ge, lane + 1] != -2
                    and d_pos[e - ge, lane + 1] + bot == d_pos[e, lane]
                ):
                    edits.append((B_INS, pending, False))  # extension (e)
                    pending = 0
                    lane += 1
                    e -= ge
                else:
                    break
            edits.append((B_INS, pending, True))  # chain opener (o)
            lane += 1
            e -= go
        else:
            edits.append((MISMATCH, pending, False))
            e -= ms
    # terminal match run at energy 0
    edits.append(("", int(end[0, lane] - start[0, lane]), False))
    return edits


def edits_to_cigar(edits: list[tuple[str, int]]) -> str:
    """Render the edit list in the reference get_CIGAR's structure —
    "<first-run>" then "<op><run>" per edit in emission (reverse-
    alignment) order — but with each edit's OWN id_length (repairing the
    reference's printf bug, see module docstring)."""
    out = [str(edits[-1][1])]  # first match run (== ED_info[0].id_length)
    for op, run, _ in edits[:-1]:
        out.append(f"{op}{run}")
    return "".join(out)


def leap_backtrack_batch(result: dict, cfg: AlignConfig):
    """Backtrack every PASSED pair of a want_history leap_align result.

    Returns list of (edits, cigar) per pair; None for pairs that did not
    pass (the reference would read a stale final_ED, LV_BAG docstring).
    """
    start = np.asarray(result["start"])
    end = np.asarray(result["end"])
    i_pos = np.asarray(result["i_pos"])
    d_pos = np.asarray(result["d_pos"])
    passed = np.asarray(result["passed"])
    final_ed = np.asarray(result["penalty"])
    final_lane = np.asarray(result["final_lane_idx"])
    out = []
    for b in range(start.shape[0]):
        if not passed[b]:
            out.append(None)
            continue
        edits = leap_backtrack_one(
            start[b], end[b], i_pos[b], d_pos[b],
            int(final_ed[b]), int(final_lane[b]), cfg,
        )
        out.append((edits, edits_to_cigar(edits)))
    return out
