"""Batched LEAP / Landau-Vishkin banded affine alignment.

TPU-native re-design of the reference's LV kernel
(GASMA/benchmark/LEAP_SIMD/LV_BAG.cpp, used by the headline benchmark via
benchmark_utils.h:156-179; the SIMD variant SIMD_ED.cpp computes the same
recurrence with AVX2 masks).

Wavefront state start/end/I_pos/D_pos is [B, TL] per energy level e
(TL = 2k+3 lanes incl. 2 sentinel border lanes, LV_BAG.cpp:78). One
jax.lax.while_loop iteration advances ALL pairs one energy level: lane-axis
shifts replace the l±1 reads, and the hot `count_ID_length` char-scan
(LV_BAG.cpp:9-23, the per-cell O(run) loop) becomes an O(1) gather into a
precomputed per-lane match-run structure (next_one_index over the LEAP
hurdle rows) — the same prefix-scan trick the SIMD code approximates with
shift+tzcnt (SIMD_ED.cpp:10-61).

A ring buffer of the last R = max(go, ge, ms)+1 energy rows replaces the
full [TL, E+1] history on the filter path; want_history=True widens the
ring to the full history for leap_backtrack (the benchmark path never
needs it — LEAP CIGARs are not scored, benchmark_utils.h:256). The fused
TPU kernel lives in asm_tpu.kernels.leap_pallas (filter path only).

Semantics follow asm_tpu.reference_impl.leap_ref (fresh per-pair state and
deterministic padding — see its docstring for the reference's state-leak
quirks that are deliberately NOT reproduced).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from asm_tpu.config import AlignConfig, LeapMode
from asm_tpu.ops.packed import pack_rows, first_set_from
from asm_tpu.ops.hurdles import build_leap_lanes

# plain ints (not jnp scalars): module import must not initialize the backend
UNREACHED = -2
BIG = 1 << 29


@functools.partial(jax.jit, static_argnames=("cfg", "want_history"))
def leap_align(read_codes, read_len, ref_codes, ref_len, cfg: AlignConfig,
               want_history: bool = False):
    """Run LEAP on a batch.

    Returns dict(passed bool[B], penalty int32[B] (= af_threshold+1 when not
    passed), lane_shift int32[B] (final diagonal offset from mid)).

    With want_history=True additionally returns the full per-energy
    wavefront tables start/end/i_pos/d_pos as int32[B, af+1, TL] — the
    input to leap_backtrack (host-side CIGAR reconstruction, mirroring
    LV::backtrack LV_BAG.cpp:250-354). History costs 4*(af+1)*TL ints per
    pair; use small batches in CIGAR mode.
    """
    B, L = read_codes.shape
    k = cfg.k
    TL = cfg.leap_total_lanes
    mid = k + 1
    ms, go, ge = cfg.x, cfg.o, cfg.e
    af = cfg.leap_af_threshold
    mode = cfg.leap_mode
    # ring depth: backtracking needs the full energy history; the plain
    # filter path only the last max(go, ge, ms)+1 rows
    R = (af + 1) if want_history else max(go, ge, ms) + 1

    buflen = jnp.maximum(
        jnp.minimum(read_len, L), jnp.minimum(ref_len, L)
    ).astype(jnp.int32)  # benchmark_utils.h:162

    # bit-packed hurdle rows (uint32 words, asm_tpu.ops.packed): the hot
    # count_ID_length query becomes ctz/popcount word math instead of a
    # gather into a precomputed [B, TL, L+1] next-index table
    lanes = pack_rows(build_leap_lanes(read_codes, ref_codes, k) != 0)

    lane_ids = jnp.arange(TL, dtype=jnp.int32)
    interior = (lane_ids >= 1) & (lane_ids <= TL - 2)
    top = (lane_ids >= mid).astype(jnp.int32)  # LV_BAG.cpp:153-157
    bot = (lane_ids <= mid).astype(jnp.int32)
    lane_diff = jnp.abs(lane_ids - mid)

    def count_id(start):  # LV_BAG.cpp:9-23 as packed first-mismatch scan
        g = first_set_from(lanes, jnp.maximum(start, 0))
        run_end = jnp.minimum(g, buflen[:, None])
        return jnp.where(start >= buflen[:, None], start, run_end)

    # ---- e = 0 row (LV::init :95-105 + LV::run :131-147) ----
    if mode in (LeapMode.LOCAL, LeapMode.SEMI_FREE_BEGIN):
        start0 = jnp.broadcast_to(lane_diff[None, :], (B, TL)).astype(jnp.int32)
    else:
        start0 = jnp.where(lane_diff[None, :] == 0, 0, UNREACHED)
        start0 = jnp.broadcast_to(start0, (B, TL)).astype(jnp.int32)
    start0 = jnp.where(interior[None, :], start0, UNREACHED)
    end0 = jnp.where(start0 >= 0, count_id(start0), UNREACHED)

    conv0 = (end0 == buflen[:, None]) & (start0 >= 0) & interior[None, :]
    passed0 = jnp.any(conv0, axis=1)
    lane0 = jnp.argmax(conv0, axis=1).astype(jnp.int32)  # first converged lane

    # ring buffers: row r holds energy level e with e % R == r
    end_hist = jnp.full((B, R, TL), UNREACHED, jnp.int32)
    end_hist = end_hist.at[:, 0, :].set(end0)
    i_hist = jnp.full((B, R, TL), UNREACHED, jnp.int32)
    d_hist = jnp.full((B, R, TL), UNREACHED, jnp.int32)

    state = dict(
        e=jnp.int32(1),
        end_hist=end_hist,
        i_hist=i_hist,
        d_hist=d_hist,
        passed=passed0,
        final_ed=jnp.where(passed0, 0, af + 1).astype(jnp.int32),
        final_lane=jnp.where(passed0, lane0, mid).astype(jnp.int32),
    )
    if want_history:
        start_hist = jnp.full((B, R, TL), UNREACHED, jnp.int32)
        state["start_hist"] = start_hist.at[:, 0, :].set(start0)

    def row(hist, e_idx):
        r = jnp.mod(e_idx, R)
        return jax.lax.dynamic_slice_in_dim(hist, r, 1, axis=1)[:, 0, :]

    def shift_up(a):  # value at lane l-1 (sentinel at l=0)
        return jnp.concatenate(
            [jnp.full((B, 1), UNREACHED, a.dtype), a[:, :-1]], axis=1
        )

    def shift_dn(a):  # value at lane l+1
        return jnp.concatenate(
            [a[:, 1:], jnp.full((B, 1), UNREACHED, a.dtype)], axis=1
        )

    def cond(s):
        return (s["e"] <= af) & jnp.any(~s["passed"])

    def body(s):
        e = s["e"]
        end_go = row(s["end_hist"], e - go)
        i_ge = row(s["i_hist"], e - ge)
        d_ge = row(s["d_hist"], e - ge)
        end_ms = row(s["end_hist"], e - ms)

        ok_go = e >= go
        ok_ge = e >= ge
        ok_ms = e >= ms

        end_up = jnp.where(ok_go, shift_up(end_go), UNREACHED)
        i_up = jnp.where(ok_ge, shift_up(i_ge), UNREACHED)
        i_new = jnp.where(
            (end_up >= 0) & (end_up > i_up),
            end_up + top[None, :],
            jnp.where(i_up >= 0, i_up + top[None, :], UNREACHED),
        )

        end_dn = jnp.where(ok_go, shift_dn(end_go), UNREACHED)
        d_dn = jnp.where(ok_ge, shift_dn(d_ge), UNREACHED)
        d_new = jnp.where(
            (end_dn >= 0) & (end_dn > d_dn),
            end_dn + bot[None, :],
            jnp.where(d_dn >= 0, d_dn + bot[None, :], UNREACHED),
        )

        s_ms = jnp.where(ok_ms & (end_ms >= 0), end_ms + 1, UNREACHED)
        start_new = jnp.maximum(s_ms, jnp.maximum(i_new, d_new))

        # border lanes are never written (LV_BAG.cpp:131 loops 1..TL-2)
        i_new = jnp.where(interior[None, :], i_new, UNREACHED)
        d_new = jnp.where(interior[None, :], d_new, UNREACHED)
        start_new = jnp.where(interior[None, :], start_new, UNREACHED)

        end_new = jnp.where(start_new >= 0, count_id(start_new), UNREACHED)

        conv = (end_new == buflen[:, None]) & (start_new >= 0) & interior[None, :]
        if mode in (LeapMode.GLOBAL, LeapMode.SEMI_FREE_BEGIN):
            t = e + jnp.where(lane_diff == 0, 0, go + (lane_diff - 1) * ge)
            tt = jnp.where(conv & (t[None, :] <= af), t[None, :], BIG)
            tmin = jnp.min(tt, axis=1)
            pass_now = tmin < BIG
            lane_now = jnp.argmin(tt, axis=1).astype(jnp.int32)
        else:
            pass_now = jnp.any(conv, axis=1)
            # LV_BAG.cpp:233-237 overwrites per lane -> LAST converged wins
            rev = jnp.flip(conv, axis=1)
            lane_now = (TL - 1 - jnp.argmax(rev, axis=1)).astype(jnp.int32)

        fresh = pass_now & ~s["passed"]
        passed = s["passed"] | pass_now
        final_ed = jnp.where(fresh, e, s["final_ed"])
        final_lane = jnp.where(fresh, lane_now, s["final_lane"])

        # freeze history rows of already-passed pairs (they stop evolving)
        act = ~s["passed"]
        r = jnp.mod(e, R)

        def put(hist, new_row):
            old = jax.lax.dynamic_slice_in_dim(hist, r, 1, axis=1)[:, 0, :]
            new = jnp.where(act[:, None], new_row, old)
            return jax.lax.dynamic_update_slice_in_dim(
                hist, new[:, None, :], r, axis=1
            )

        out = dict(
            e=e + 1,
            end_hist=put(s["end_hist"], end_new),
            i_hist=put(s["i_hist"], i_new),
            d_hist=put(s["d_hist"], d_new),
            passed=passed,
            final_ed=final_ed,
            final_lane=final_lane,
        )
        if want_history:
            out["start_hist"] = put(s["start_hist"], start_new)
        return out

    s = jax.lax.while_loop(cond, body, state)
    out = dict(
        passed=s["passed"],
        penalty=s["final_ed"],
        lane_shift=s["final_lane"] - mid,
    )
    if want_history:
        out["start"] = s["start_hist"]
        out["end"] = s["end_hist"]
        out["i_pos"] = s["i_hist"]
        out["d_pos"] = s["d_hist"]
        out["final_lane_idx"] = s["final_lane"]
    return out
