"""Fused Pallas TPU kernel for LEAP / Landau-Vishkin banded alignment.

Same semantics as asm_tpu.kernels.leap.leap_align (the portable XLA
reference path); this kernel fuses hurdle-lane construction, bit-packing,
and the energy wavefront into one VMEM-resident pass. want_cigar=True
additionally fuses the BACKTRACK (LV::backtrack, LV_BAG.cpp:250-354): the
energy history is parked in VMEM as byte-packed cells and replayed by a
downward per-level sweep emitting packed edit records — bit-equal to
leap_align(want_history=True) + leap_backtrack_batch (decode with
leap_cigar_decode), at fused-kernel throughput instead of the XLA history
path's full-table materialization.

Layout mirrors greedy_pallas: pair-per-lane [_TILE/128, 128] tiles per
grid step, TL = 2k+3 diagonal lanes unrolled statically, lane rows as
W = L/32 uint32 words, the hot count_ID_length query (LV_BAG.cpp:9-23) as
ctz word math. The e-level ring history (end/I_pos/D_pos rows for the last
R = max(go,ge,ms)+1 energy levels) lives in VMEM scratch, dynamically
indexed by e % R; the while carry is the scalar energy level only (Mosaic
mis-lays-out vector while-carries — see greedy_pallas).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from asm_tpu.config import AlignConfig, LeapMode

import os as _os

# pairs per grid step; ASM_LEAP_TILE=4096 doubles the block (bigger
# contiguous DMAs with the tiled layout; want_cigar's VMEM history may
# not fit at 4096 with large leap_energy_bound — keep 2048 there)
_TILE = int(_os.environ.get("ASM_LEAP_TILE", 2048))
_SUB = _TILE // 128
UNREACHED = -2
BIG = 1 << 29


def _ctz32(w):
    low = w & (~w + jnp.uint32(1))
    return jax.lax.population_count(low - jnp.uint32(1)).astype(jnp.int32)


def _leap_kernel(cfg: AlignConfig, planes: bool, want_cigar: bool,
                 semantics: str, use_shd_gate: bool, *refs):
    if want_cigar:
        (rc_ref, fc_ref, rl_ref, fl_ref, passed_ref, pen_ref, lane_ref_out,
         rec_ref, hist_ref, st_ref, bt_ref) = refs
    else:
        (rc_ref, fc_ref, rl_ref, fl_ref, passed_ref, pen_ref, lane_ref_out,
         hist_ref, st_ref) = refs
        rec_ref = bt_ref = None
    k = cfg.k
    TL = cfg.leap_total_lanes
    mid = k + 1
    L = cfg.max_len
    W = L // 32
    ms, go, ge = cfg.x, cfg.o, cfg.e
    af = cfg.leap_af_threshold
    mode = cfg.leap_mode
    R = max(go, ge, ms) + 1
    E = cfg.leap_energy_bound

    # cell packing for the want_cigar backtrack history: positions are
    # biased by +2 (values live in [-2, L]) and packed 4-per-uint32
    # (8-bit fields) when L <= 253, or 2-per-uint32 (16-bit fields, TWO
    # words per cell) for longer sequences — the "wide" mode that lifts
    # the reference-style length cap from the fused CIGAR path at 2x
    # the history VMEM (leap_cigar_tile sizes the tile accordingly)
    wide = L > 253  # 2 uint32 words per packed cell when wide

    def pack4(s, e_, i, d):
        u = lambda v: (v + 2).astype(jnp.uint32)
        return (u(s) | (u(e_) << 8) | (u(i) << 16) | (u(d) << 24))

    def pack_cell2(a, b):
        u = lambda v: (v + 2).astype(jnp.uint32)
        return u(a) | (u(b) << 16)

    m = jnp.minimum(rl_ref[...], L)
    n = jnp.minimum(fl_ref[...], L)
    shape = m.shape
    buflen = jnp.maximum(m, n)  # benchmark_utils.h:162

    def mask_ge(c, w):
        low = jnp.clip(c - 32 * w, 0, 32)
        msk = jnp.uint32(0xFFFFFFFF) << jnp.minimum(low, 31).astype(jnp.uint32)
        return jnp.where(low >= 32, jnp.uint32(0), msk)

    # ---- pack SWAR code words into bit-planes, once per tile ------------
    # Identical machinery to greedy_pallas (carry-free 0x01020408 multiply
    # compaction of one bit per byte into a nibble); bit p of plane word w
    # = bit of code at position 32*w + p.
    M1 = jnp.uint32(0x01010101)
    MM = jnp.uint32(0x01020408)

    def pack2(ref):
        p0, p1 = [], []
        for w in range(W):
            a0 = a1 = None
            for jj in range(8):
                v = ref[8 * w + jj]
                n0 = ((v & M1) * MM) >> 24
                n1 = (((v >> 1) & M1) * MM) >> 24
                if jj == 0:
                    a0, a1 = n0, n1
                else:
                    s = jnp.uint32(4 * jj)
                    a0 = a0 | (n0 << s)
                    a1 = a1 | (n1 << s)
            p0.append(a0)
            p1.append(a1)
        return p0, p1

    if planes == "tiled":
        # pre_staged="planes_tiled": same plane rows, tile-major block
        # (one contiguous DMA per grid step)
        r_pl = ([rc_ref[0, w] for w in range(W)],
                [rc_ref[0, W + w] for w in range(W)])
        f_pl = ([fc_ref[0, w] for w in range(W)],
                [fc_ref[0, W + w] for w in range(W)])
    elif planes:
        # pre_staged="planes": rows ARE the bit-planes (stage_planes_t) —
        # row w = plane0 word w, row W+w = plane1 word w; no pack needed
        r_pl = ([rc_ref[w] for w in range(W)],
                [rc_ref[W + w] for w in range(W)])
        f_pl = ([fc_ref[w] for w in range(W)],
                [fc_ref[W + w] for w in range(W)])
    else:
        r_pl = pack2(rc_ref)
        f_pl = pack2(fc_ref)
    zero_u = jnp.zeros(shape, jnp.uint32)

    def funnel_l(words, s):
        """Shift a packed row LEFT by s bits: result bit p = input bit
        p - s (the lane's sequence displaced s positions forward)."""
        if s == 0:
            return words
        return [
            (words[w] << jnp.uint32(s))
            | ((words[w - 1] >> jnp.uint32(32 - s)) if w > 0 else zero_u)
            for w in range(W)
        ]

    # ---- hurdle rows per lane (build_leap_lanes semantics) --------------
    # lane l < mid: A[p-(mid-l)] vs B[p]; l > mid: A[p] vs B[p-(l-mid)];
    # border lanes and out-of-range positions (p < offset, or past either
    # operand's true end — sentinel codes 4/5/6 always differ from
    # everything) are hurdles. With 2-bit planes that is: plane XOR |
    # closed-form validity — invalid = p < off (static mask per lane) or
    # p >= len + off (mask_ge, shared across lanes via precompute).
    inv_a = [[mask_ge(m + s, w) for w in range(W)] for s in range(k + 1)]
    inv_b = [[mask_ge(n + s, w) for w in range(W)] for s in range(k + 1)]

    def mask_lt_const(c, w):  # compile-time constant low-bits mask
        low = min(max(c - 32 * w, 0), 32)
        return jnp.uint32(0 if low == 0 else (0xFFFFFFFF >> (32 - low)))

    lanes = []
    for l in range(TL):
        if l == 0 or l == TL - 1:
            lanes.append([jnp.full(shape, 0xFFFFFFFF, jnp.uint32)
                          for _ in range(W)])
            continue
        a_off = max(mid - l, 0)
        b_off = max(l - mid, 0)
        a0, a1 = (funnel_l(p, a_off) for p in r_pl)
        b0, b1 = (funnel_l(p, b_off) for p in f_pl)
        off = max(a_off, b_off)  # exactly one of the two is nonzero
        lanes.append([
            (a0[w] ^ b0[w]) | (a1[w] ^ b1[w])
            | inv_a[a_off][w] | inv_b[b_off][w] | mask_lt_const(off, w)
            for w in range(W)
        ])

    def count_id(l, start):
        """LV_BAG.cpp:9-23: match-run end from `start` on lane l."""
        c = jnp.maximum(start, 0)
        first = jnp.full(shape, L, jnp.int32)
        for w in range(W):
            masked = lanes[l][w] & mask_ge(c, w)
            idx = 32 * w + _ctz32(masked)
            first = jnp.minimum(first, jnp.where(masked == 0, L, idx))
        run_end = jnp.minimum(first, buflen)
        return jnp.where(start >= buflen, start, run_end)

    # hist_ref layout: [3, R, TL] planes of [_SUB,128]: 0 end, 1 i_pos, 2 d_pos
    zero = jnp.zeros(shape, jnp.int32)
    unreached = zero + UNREACHED

    # ---- e = 0 row (LV::init + first run step) ----
    for l in range(TL):
        interior = 1 <= l <= TL - 2
        ld = abs(l - mid)
        if not interior:
            start0 = unreached
        elif mode in (LeapMode.LOCAL, LeapMode.SEMI_FREE_BEGIN):
            start0 = zero + ld
        else:
            start0 = (zero if ld == 0 else unreached)
        end0 = jnp.where(start0 >= 0, count_id(l, start0), UNREACHED)
        hist_ref[0, 0, l] = end0
        hist_ref[1, 0, l] = unreached
        hist_ref[2, 0, l] = unreached
        if want_cigar:
            if wide:
                bt_ref[2 * l] = pack_cell2(start0, end0)
                bt_ref[2 * l + 1] = pack_cell2(unreached, unreached)
            else:
                bt_ref[l] = pack4(start0, end0, unreached, unreached)

    corrected = mode in (LeapMode.GLOBAL, LeapMode.SEMI_FREE_BEGIN)

    # st_ref rows: 0 stop, 1 final_ed, 2 final_lane, 3 ed_pass
    # (stop == pass except in simd_ed_lev, where a pair STOPS at its
    # first converged lane even when the converge correction fails it)
    conv_any = zero
    first_lane = zero + mid
    found = zero
    for l in range(1, TL - 1):
        end0 = hist_ref[0, 0, l]
        c = (end0 == buflen) & (end0 >= 0)
        if semantics == "lv_bag":
            # first converged lane in LV_BAG scan order (argmax)
            first_lane = jnp.where((found == 0) & c, l, first_lane)
        else:
            # SIMD_ED's scan order is MIRRORED vs this kernel's lane
            # axis (see kernels/leap.py) — its first is our last
            first_lane = jnp.where(c, l, first_lane)
        found = jnp.where(c, 1, found)
        conv_any = conv_any | c.astype(jnp.int32)
    if semantics == "simd_ed_affine" and corrected:
        pen0, default_pen = 1000000, 1000000  # reset_affine converge_ED
    elif corrected or semantics == "lv_bag":
        pen0, default_pen = 0, af + 1
    else:  # fresh SIMD_ED final_ED in LOCAL / SEMI_FREE_END modes
        pen0, default_pen = 0, 0
    stop0 = conv_any
    pass0 = conv_any
    pen_init = jnp.where(conv_any != 0, pen0, default_pen)
    if use_shd_gate:
        # the in-run SHD gate (SIMD_ED.cpp:270 -> bit_vec_filter_avx,
        # SHD.cpp:335-385) on the packed lane words: AND of the interior
        # lane masks (bits below the lane shift are this kernel's forced
        # hurdles == the gate's BEG mask clears them; bits past buflen
        # end-masked), then the POPCOUNT_SHD count — per-nibble 1-run
        # starts plus one for the irregular table nibble 6 — <= k. A
        # gated-out pair stops before the e=0 row with get_ED == 0 (what
        # a fresh SIMD_ED reports after the early return).
        m1 = jnp.uint32(0x11111111)
        count = jnp.zeros(shape, jnp.int32)
        for w in range(W):
            dw = jnp.full(shape, 0xFFFFFFFF, jnp.uint32)
            for l in range(1, TL - 1):
                dw = dw & lanes[l][w]
            dw = dw & ~mask_ge(buflen, w)  # MASK_AVX_END(buffer_length)
            # per-lane MASK_AVX_BEG(error-1) zeroes bits < error; the
            # outermost lane's error == k zeroes every bit < k of the
            # AND (this kernel's lane rows force those bits to 1
            # instead), and the error==0 lane's out-of-bounds BEG row
            # has bit 255 clear (shd_ref.DEFAULT_OOB_ROW)
            dw = dw & ~mask_lt_const(k, w)
            if L == 256 and w == W - 1:
                dw = dw & jnp.uint32(0x7FFFFFFF)
            starts = dw & ~((dw << jnp.uint32(1)) & jnp.uint32(0xEEEEEEEE))
            t6 = dw ^ jnp.uint32(0x66666666)
            t6 = t6 | (t6 >> jnp.uint32(1))
            t6 = t6 | (t6 >> jnp.uint32(2))
            is6 = ~t6 & m1
            count = count + jax.lax.population_count(starts).astype(
                jnp.int32
            ) + jax.lax.population_count(is6).astype(jnp.int32)
        gated = count > k
        stop0 = stop0 | gated.astype(jnp.int32)
        pass0 = jnp.where(gated, 0, pass0)
        pen_init = jnp.where(gated, 0, pen_init)
    st_ref[0] = stop0
    st_ref[1] = pen_init
    st_ref[2] = jnp.where(conv_any != 0, first_lane, mid)
    st_ref[3] = pass0

    def cond(e):
        pending = jnp.sum(1 - st_ref[0])
        return (e <= af) & (pending > 0)

    def level(e, ok_go, ok_ge, ok_ms, fwd=None, write="all"):
        """One energy level. `e` is traced int32 in the steady-state
        while loop (where every ok_* is statically True) or a Python int
        in the PEELED levels e = 1..R-1 — there the ok_* flags are
        Python bools, so the per-lane `not yet reachable` selects fold
        away at trace time. Measured on the op-count model: the folded
        selects are ~1/3 of the steady body, and e >= R makes them all
        true, so the old dynamic `jnp.where(e >= go, ...)` paid that
        cost on EVERY level.

        fwd = (end, i, d) row lists of level e-1 held in REGISTERS (the
        steady loop runs levels two at a time; the second level's reads
        of the just-computed row skip VMEM — statically valid for a
        plane exactly when its penalty is 1). write='skip-dead' elides
        the VMEM write of a plane whose only future reader is the
        in-body forwarded level (penalty 1): together these halve the
        e-ring traffic at unit penalties (round-4 roofline 'mem'
        residual, VERDICT r4 item #5)."""
        passed = st_ref[0] != 0
        act = ~passed

        r_go = (e - go) % R
        r_ge = (e - ge) % R
        r_ms = (e - ms) % R

        # read previous rows (lane-shifted accesses are static unrolls);
        # border lanes are never written past init, so their rows are the
        # UNREACHED constant — letting the edge-interior lanes' I/D
        # recurrences constant-fold at trace time
        def rows(plane, r, ok, fwd_rows):
            if ok is False:  # peeled level below the cost: never read
                return [unreached] * TL
            if fwd_rows is not None:
                return fwd_rows
            return [unreached if l in (0, TL - 1) else hist_ref[plane, r, l]
                    for l in range(TL)]

        # register-forward a plane iff this read targets the row the
        # in-body previous level just computed: slot (e-p)%R == (e-1)%R
        # <=> p == 1 (p < R), a STATIC condition
        end_go = rows(0, r_go, ok_go,
                      fwd[0] if fwd is not None and go == 1 else None)
        i_ge = rows(1, r_ge, ok_ge,
                    fwd[1] if fwd is not None and ge == 1 else None)
        d_ge = rows(2, r_ge, ok_ge,
                    fwd[2] if fwd is not None and ge == 1 else None)
        if ms == go and (ok_ms is ok_go or ok_ms == ok_go):
            end_ms = end_go  # same plane, same ring slot: one VMEM read
        else:
            end_ms = rows(0, r_ms, ok_ms,
                          fwd[0] if fwd is not None and ms == 1 else None)

        new_end, new_i, new_d, new_start = [], [], [], []
        conv = []
        for l in range(TL):
            if l == 0 or l == TL - 1:
                new_end.append(unreached)
                new_i.append(unreached)
                new_d.append(unreached)
                new_start.append(unreached)
                conv.append(zero != 0)
                continue
            top = 1 if l >= mid else 0
            bot = 1 if l <= mid else 0
            # the reference picks end over I_pos only when end is
            # reachable AND strictly further (LV_BAG.cpp run); on the
            # value domain {UNREACHED} u [0, inf) that whole selection
            # is just the max, advanced when reachable — ties land on
            # the same value either way
            end_up = end_go[l - 1] if ok_go else unreached
            i_up = i_ge[l - 1] if ok_ge else unreached
            i_cand = jnp.maximum(end_up, i_up)
            i_new = jnp.where(i_cand >= 0, i_cand + top, UNREACHED)
            end_dn = end_go[l + 1] if ok_go else unreached
            d_dn = d_ge[l + 1] if ok_ge else unreached
            d_cand = jnp.maximum(end_dn, d_dn)
            d_new = jnp.where(d_cand >= 0, d_cand + bot, UNREACHED)
            s_ms = (jnp.where(end_ms[l] >= 0, end_ms[l] + 1, UNREACHED)
                    if ok_ms else unreached)
            start_new = jnp.maximum(s_ms, jnp.maximum(i_new, d_new))
            end_new = jnp.where(
                start_new >= 0, count_id(l, start_new), UNREACHED
            )
            new_end.append(end_new)
            new_i.append(i_new)
            new_d.append(d_new)
            new_start.append(start_new)
            conv.append((end_new == buflen) & (start_new >= 0))

        if semantics == "simd_ed_lev":
            # run_levenshtein stops at the FIRST converged lane in ITS
            # scan order (mirrored: our LAST) whether or not the
            # converge correction passes it (SIMD_ED.cpp:333-352)
            stop_now = zero != 0
            lane_now = zero
            ld_now = zero
            for l in range(1, TL - 1):
                stop_now = stop_now | conv[l]
                lane_now = jnp.where(conv[l], l, lane_now)
                ld_now = jnp.where(conv[l], abs(l - mid), ld_now)
            if corrected:
                pen_now = e + ld_now  # converge_ED
                pass_now = stop_now & (pen_now <= af)
            else:
                pen_now = zero + e
                pass_now = stop_now
        elif corrected:
            tmin = zero + BIG
            lane_now = zero
            for l in range(1, TL - 1):
                ld = abs(l - mid)
                t = e + (0 if ld == 0 else go + (ld - 1) * ge)
                tt = jnp.where(conv[l] & (t <= af), t, BIG)
                if semantics == "simd_ed_affine":
                    # strict `t < converge_ED` keeps the earliest lane
                    # in SIMD_ED's mirrored scan order = our last
                    better = tt <= tmin
                else:
                    better = tt < tmin
                tmin = jnp.where(better, tt, tmin)
                lane_now = jnp.where(better, l, lane_now)
            pass_now = tmin < BIG
            stop_now = pass_now
            # LV_BAG reports the uncorrected energy; SIMD_ED::get_ED the
            # corrected converge_ED (SIMD_ED.cpp:748-753)
            pen_now = tmin if semantics == "simd_ed_affine" else zero + e
        else:
            pass_now = zero != 0
            lane_now = zero
            for l in range(1, TL - 1):  # LAST converged lane wins
                pass_now = pass_now | conv[l]
                lane_now = jnp.where(conv[l], l, lane_now)
            stop_now = pass_now
            pen_now = zero + e

        fresh = stop_now & act
        st_ref[0] = (~act | stop_now).astype(jnp.int32)
        st_ref[3] = jnp.where(fresh & pass_now, 1, st_ref[3])
        st_ref[1] = jnp.where(fresh, pen_now, st_ref[1])
        st_ref[2] = jnp.where(fresh, lane_now, st_ref[2])

        # history rows are written UNCONDITIONALLY: a stopped pair's
        # outputs are latched in st_ref and its CIGAR history parked in
        # bt_ref the level it happened, so its evolving wavefront rows
        # are never read again (values stay bounded: end <= buflen,
        # I/D grow <= 1/level <= L + af) — the old per-pair freeze
        # (3 reads + 3 selects per lane per level) was dead weight.
        # write='skip-dead': a plane whose every consumer has penalty 1
        # is only read by the NEXT level, which receives it in registers
        # — its VMEM write is dead
        r = e % R
        w0 = write == "all" or go >= 2 or ms >= 2
        w12 = write == "all" or ge >= 2
        for l in range(1, TL - 1):
            if w0:
                hist_ref[0, r, l] = new_end[l]
            if w12:
                hist_ref[1, r, l] = new_i[l]
                hist_ref[2, r, l] = new_d[l]
        if want_cigar:
            # park this energy row for the backtrack walk (rows past a
            # pair's own final energy hold junk and are never read)
            def park():
                base = e * TL
                for l in range(TL):
                    if wide:
                        bt_ref[pl.ds((base + l) * 2, 1)] = pack_cell2(
                            new_start[l], new_end[l])[None]
                        bt_ref[pl.ds((base + l) * 2 + 1, 1)] = pack_cell2(
                            new_i[l], new_d[l])[None]
                    else:
                        bt_ref[pl.ds(base + l, 1)] = pack4(
                            new_start[l], new_end[l], new_i[l], new_d[l]
                        )[None]

            if isinstance(e, int):
                if e <= E:
                    park()
            else:
                pl.when(e <= E)(park)
        return new_end, new_i, new_d

    def body(e):
        # TWO levels per iteration: the second reads the first's rows
        # straight from registers for every penalty-1 plane (e-ring
        # VMEM traffic halved at unit penalties), and the first level's
        # dead writes are elided. st_ref is re-read inside each level,
        # so stop flags set by the first level freeze pairs in the
        # second as before.
        fwd = level(e, True, True, True, write="skip-dead")

        @pl.when(e + 1 <= af)
        def _():
            level(e + 1, True, True, True, fwd=fwd)

        return e + 2

    # peel levels 1..R-1 (static: the reachability selects fold away;
    # skipped entirely when every pair already stopped at e=0, e.g.
    # SHD-gated or converged batches)
    for pe in range(1, min(R - 1, af) + 1):
        @pl.when(jnp.sum(1 - st_ref[0]) > 0)
        def _(pe=pe):
            level(pe, pe >= go, pe >= ge, pe >= ms)

    # steady state: e >= R > max(go, ge, ms) makes every level reachable
    jax.lax.while_loop(cond, body, jnp.int32(max(R, 1)))

    passed_ref[...] = st_ref[3]
    pen_ref[...] = st_ref[1]
    lane_ref_out[...] = st_ref[2] - mid

    if not want_cigar:
        return

    # ---- fused backtrack (LV::backtrack, LV_BAG.cpp:250-354) -----------
    # Flattened form of leap_backtrack_one: every emitted edit lowers the
    # energy by >= 1, so each pair acts at most once per energy level and
    # the walk is a downward sweep over OCCUPIED levels only (ev = current
    # per-tile max of the per-pair cursor). A chain-mode flag replaces the
    # reference's inner extension while-loops: 0 = fresh arrival (outer
    # loop), 1 = inside an insertion chain, 2 = inside a deletion chain.
    # rec_ref row ev (int32) holds that level's edit per pair:
    # op in bits 0-1 (0 none, 1 M, 2 I, 3 D), is_open bit 2, match-run
    # bits 3+; row 0 holds the terminal match run (no edit ends at e=0).
    rec_ref[...] = jnp.zeros((E + 1,) + shape, jnp.int32)
    passed_v = st_ref[3] != 0
    st_ref[4] = jnp.where(passed_v, st_ref[1], 0)  # cur_e (0 = done)
    st_ref[5] = st_ref[2]                          # cur_lane (lane index)
    st_ref[6] = zero                               # mode = OUTER

    def sel_lane(rows, lane_vec):
        out = rows[0]
        for l in range(1, TL):
            out = jnp.where(lane_vec == l, rows[l], out)
        return out

    def unpack(w, byte):
        return ((w >> jnp.uint32(8 * byte)) & jnp.uint32(0xFF)).astype(
            jnp.int32
        ) - 2

    def unpack16(w, half):
        return ((w >> jnp.uint32(16 * half)) & jnp.uint32(0xFFFF)).astype(
            jnp.int32
        ) - 2

    def read_rows(ev):
        """Per-lane cell words at energy ev: [words0] (narrow) or
        [wordsA, wordsB] (wide)."""
        if wide:
            return [
                [bt_ref[pl.ds((ev * TL + l) * 2 + c, 1)][0]
                 for l in range(TL)]
                for c in range(2)
            ]
        return [[bt_ref[pl.ds(ev * TL + l, 1)][0] for l in range(TL)]]

    def cell(rows, lane_vec):
        """(s, e, i, d) int32 fields of the lane-selected cell."""
        if wide:
            wa = sel_lane(rows[0], lane_vec)
            wb = sel_lane(rows[1], lane_vec)
            return (unpack16(wa, 0), unpack16(wa, 1),
                    unpack16(wb, 0), unpack16(wb, 1))
        w = sel_lane(rows[0], lane_vec)
        return (unpack(w, 0), unpack(w, 1), unpack(w, 2), unpack(w, 3))

    def wcond(it):
        # every emitted edit lowers the acting pairs' cursor by >= 1, so
        # E sweeps always suffice; the `it` bound is a belt-and-braces
        # guard against junk history (pairs passing above energy E)
        return (it <= E) & (jnp.max(st_ref[4]) > 0)

    def wbody(it):
        cur_e = st_ref[4]
        cur_lane = st_ref[5]
        cmode = st_ref[6]
        ev = jnp.max(cur_e)
        act = cur_e == ev  # ev > 0, so act excludes finished pairs

        rows = read_rows(ev)
        evg = jnp.maximum(ev - ge, 0)
        rows_g = read_rows(evg)
        ok_ge = ev - ge >= 0  # scalar

        s_cur, e_cur, i_cur, d_cur = cell(rows, cur_lane)
        # neighbour chain cells at energy ev-ge; out-of-range lane
        # selectors fall back to row 0 — a border lane, always UNREACHED
        i_prev = cell(rows_g, cur_lane - 1)[2]
        d_prev = cell(rows_g, cur_lane + 1)[3]

        # bool-valued jnp.where dies in Mosaic ("unsupported target
        # bitwidth for truncation") — combine booleans with logical ops
        fresh = cmode == 0
        run = jnp.where(fresh, e_cur - s_cur, 0)
        is_i = (fresh & (s_cur == i_cur)) | (~fresh & (cmode == 1))
        is_d = (fresh & (s_cur != i_cur) & (s_cur == d_cur)) | (
            ~fresh & (cmode == 2)
        )
        top = (cur_lane >= mid).astype(jnp.int32)
        bot = (cur_lane <= mid).astype(jnp.int32)
        ext_i = ok_ge & (i_prev != UNREACHED) & (i_prev + top == i_cur)
        ext_d = ok_ge & (d_prev != UNREACHED) & (d_prev + bot == d_cur)

        op = jnp.where(is_i, 2, jnp.where(is_d, 3, 1))
        is_open = (is_i & ~ext_i) | (is_d & ~ext_d)
        packed = jnp.where(
            act, op | (is_open.astype(jnp.int32) << 2) | (run << 3), 0
        )
        rec_ref[pl.ds(ev, 1)] = packed[None]

        d_lane = jnp.where(is_i, -1, jnp.where(is_d, 1, 0))
        de = jnp.where(
            is_i, jnp.where(ext_i, ge, go),
            jnp.where(is_d, jnp.where(ext_d, ge, go), ms),
        )
        new_mode = jnp.where(is_i & ext_i, 1, jnp.where(is_d & ext_d, 2, 0))
        st_ref[4] = jnp.where(act, jnp.maximum(ev - de, 0), cur_e)
        st_ref[5] = jnp.where(act, cur_lane + d_lane, cur_lane)
        st_ref[6] = jnp.where(act, new_mode, cmode)
        return it + 1

    jax.lax.while_loop(wcond, wbody, jnp.int32(0))

    # terminal match run at energy 0 on the walk's final lane
    # (leap_backtrack_one's trailing ('', end-start) entry)
    rows0 = read_rows(jnp.int32(0))
    c0 = cell(rows0, st_ref[5])
    term = c0[1] - c0[0]
    rec_ref[0] = jnp.where(passed_v, term, 0)


def leap_cigar_vmem_bytes(cfg: AlignConfig, tile: int) -> int:
    """VMEM bytes the want_cigar kernel needs per grid step: the packed
    backtrack history + rec output block scale with (E+1) * tile, which is
    what caps the fused path's energy bound at a given tile size."""
    TL = cfg.leap_total_lanes
    R = max(cfg.o, cfg.e, cfg.x) + 1
    E = cfg.leap_energy_bound
    cw = 2 if cfg.max_len > 253 else 1  # uint32 words per packed cell
    per128 = 4 * 128 * (
        (E + 1) * (TL * cw + 1)  # bt_ref history + rec output block
        + 3 * R * TL           # hist ring
        + 7 + 3 + 2            # st rows, out blocks, len blocks
        + 2 * (cfg.max_len // 16)  # two code plane blocks
    )
    return per128 * (tile // 128)


def leap_cigar_tile(cfg: AlignConfig, max_tile: int | None = None,
                    vmem_budget: int = 12 << 20) -> int | None:
    """Largest power-of-two grid tile (>= 1024) whose want_cigar VMEM
    scratch fits `vmem_budget` (~16 MB/core minus headroom), or None if
    even 1024 does not fit (fall back to the XLA history path). The
    floor is 1024: Mosaic requires the (tile/128, 128) pair blocks'
    sublane dim divisible by 8."""
    t = max_tile if max_tile is not None else _TILE
    while t >= 1024:
        if leap_cigar_vmem_bytes(cfg, t) <= vmem_budget:
            return t
        t //= 2
    return None


@functools.partial(
    jax.jit, static_argnames=("cfg", "interpret", "pre_staged", "want_cigar",
                              "semantics", "use_shd_gate", "tile")
)
def leap_align_pallas(read_codes, read_len, ref_codes, ref_len,
                      cfg: AlignConfig, interpret: bool = False,
                      pre_staged: bool = False, want_cigar: bool = False,
                      semantics: str = "lv_bag",
                      use_shd_gate: bool = False,
                      tile: int | None = None):
    """Drop-in replacement for leap_align (passed / penalty / lane_shift).

    want_cigar=True additionally runs the BACKTRACK inside the kernel
    (the fused equivalent of leap_align(want_history=True) +
    leap_backtrack, mirroring LV::backtrack LV_BAG.cpp:250-354): the full
    energy history is parked in VMEM as byte-packed (start, end, I_pos,
    D_pos) cells and replayed by a downward per-energy-level sweep,
    emitting one packed edit record per (energy, pair) into `edit_rec`
    int32[E+1, B] (E = cfg.leap_energy_bound; row 0 = terminal match
    run). Decode with `leap_cigar_decode` — bit-equal to
    leap_backtrack_batch. Pairs must pass within energy E: assert via
    `(penalty * passed).max() <= E` (the kernel cannot, mirroring the
    greedy steps_bound contract). Cell values carry a +2 bias and are
    byte-packed at max_len <= 253, or 16-bit-packed in two words per
    cell ("wide") beyond — the fused path has no length cap (2x history
    VMEM in wide mode; leap_cigar_tile accounts for it).

    pre_staged=True (or "swar"): codes are position-major SWAR words
    uint32[L//4, B] from greedy_pallas.stage_swar_t. pre_staged="planes":
    position-major 2-bit planes uint32[L//16, B] from
    greedy_pallas.stage_planes_t — 4x denser, kernel skips the per-tile
    pack (the shared production corpus layout). The [B, L] path bitcasts
    + transposes on device — correct but slow at large B (XLA's
    transpose runs far below HBM speed).

    semantics / use_shd_gate mirror kernels/leap.py (LV_BAG vs SIMD_ED
    selection + reporting; the in-run SHD pre-filter, here computed
    IN-KERNEL on the packed lane words so a gated filter batch is one
    fused kernel). Bit-equal to the XLA path per tests/test_simd_ed.py;
    want_cigar requires lv_bag (the backtrack mirrors LV_BAG).
    """
    L = cfg.max_len
    assert L % 32 == 0
    TL = cfg.leap_total_lanes
    R = max(cfg.o, cfg.e, cfg.x) + 1
    E = cfg.leap_energy_bound
    # want_cigar packs backtrack cells 8-bit (L <= 253) or 16-bit
    # ("wide", any L) — see pack4/pack2 in the kernel
    planes = "tiled" if pre_staged == "planes_tiled" \
        else pre_staged == "planes"
    # grid tile: `tile` overrides the module default — want_cigar VMEM
    # scratch scales with (E+1) * tile, so high-energy CIGAR passes run
    # smaller tiles (leap_cigar_tile picks the largest that fits)
    T = _TILE if tile is None else tile
    assert T % 128 == 0
    SUB = T // 128

    if pre_staged == "planes_tiled":
        NBT, rows2, S = read_codes.shape
        assert rows2 == L // 16
        # the staged tile S may exceed the grid tile T: each grid step
        # then reads one T-slice of a staged block (still contiguous)
        assert S % T == 0, (S, T)
        r_sub = S // T
        assert ref_codes.shape == (NBT, rows2, S)
        assert read_codes.dtype == jnp.uint32
        B = read_len.shape[0]
        BP = NBT * S
        assert B <= BP and BP - B < S
        if BP > B:
            zero_l = jnp.zeros((BP - B,), jnp.int32)
            read_len = jnp.concatenate([read_len.astype(jnp.int32), zero_l])
            ref_len = jnp.concatenate([ref_len.astype(jnp.int32), zero_l])
        NB = BP // 128
        rc_t = read_codes.reshape(NBT, rows2, S // 128, 128)
        fc_t = ref_codes.reshape(NBT, rows2, S // 128, 128)
    elif pre_staged:
        Wq, B = read_codes.shape
        assert Wq == (L // 16 if planes else L // 4)
        assert read_codes.dtype == jnp.uint32
        pad = (-B) % T
        BP = B + pad
        if pad:
            zero_c = jnp.zeros((Wq, pad), jnp.uint32)
            zero_l = jnp.zeros((pad,), jnp.int32)
            read_codes = jnp.concatenate([read_codes, zero_c], axis=1)
            ref_codes = jnp.concatenate([ref_codes, zero_c], axis=1)
            read_len = jnp.concatenate([read_len.astype(jnp.int32), zero_l])
            ref_len = jnp.concatenate([ref_len.astype(jnp.int32), zero_l])
        NB = BP // 128
        rc_t = read_codes.reshape(Wq, NB, 128)
        fc_t = ref_codes.reshape(Wq, NB, 128)
    else:
        B, Lc = read_codes.shape
        assert Lc == L
        pad = (-B) % T
        BP = B + pad
        if pad:
            zero_c = jnp.zeros((pad, L), read_codes.dtype)
            zero_l = jnp.zeros((pad,), jnp.int32)
            read_codes = jnp.concatenate([read_codes, zero_c])
            ref_codes = jnp.concatenate([ref_codes, zero_c])
            read_len = jnp.concatenate([read_len.astype(jnp.int32), zero_l])
            ref_len = jnp.concatenate([ref_len.astype(jnp.int32), zero_l])
        NB = BP // 128
        rc4 = jax.lax.bitcast_convert_type(
            read_codes.reshape(BP, L // 4, 4), jnp.uint32
        )
        fc4 = jax.lax.bitcast_convert_type(
            ref_codes.reshape(BP, L // 4, 4), jnp.uint32
        )
        rc_t = rc4.T.reshape(L // 4, NB, 128)
        fc_t = fc4.T.reshape(L // 4, NB, 128)
    rl_t = read_len.astype(jnp.int32).reshape(NB, 128)
    fl_t = ref_len.astype(jnp.int32).reshape(NB, 128)

    code_rows = L // 16 if planes else L // 4
    assert semantics in ("lv_bag", "simd_ed_lev", "simd_ed_affine")
    if want_cigar:
        assert semantics == "lv_bag", (
            "the fused backtrack mirrors LV_BAG; SIMD_ED CIGARs come "
            "from reference_impl.simd_ed_ref"
        )
    if semantics == "simd_ed_lev":
        assert (cfg.x, cfg.o, cfg.e) == (1, 1, 1) and \
            cfg.leap_af_threshold == cfg.k, (
                "init_levenshtein(ED_t): unit penalties, af == k"
            )
    if use_shd_gate:
        assert semantics == "simd_ed_lev", (
            "the reference gates run_levenshtein only (the affine gate "
            "is UB; lv_bag has no gate)"
        )
    kernel = functools.partial(_leap_kernel, cfg, planes, want_cigar,
                               semantics, use_shd_gate)
    vec_spec = pl.BlockSpec((SUB, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_specs = [vec_spec, vec_spec, vec_spec]
    out_shape = [
        jax.ShapeDtypeStruct((NB, 128), jnp.int32),
        jax.ShapeDtypeStruct((NB, 128), jnp.int32),
        jax.ShapeDtypeStruct((NB, 128), jnp.int32),
    ]
    scratch = [
        pltpu.VMEM((3, R, TL, SUB, 128), jnp.int32),  # hist_ref
        pltpu.VMEM((7 if want_cigar else 4, SUB, 128), jnp.int32),  # st_ref
    ]
    if want_cigar:
        out_specs.append(
            pl.BlockSpec((E + 1, SUB, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((E + 1, NB, 128), jnp.int32))
        cw = 2 if L > 253 else 1
        scratch.append(
            pltpu.VMEM(((E + 1) * TL * cw, SUB, 128), jnp.uint32)  # bt_ref
        )
    if planes == "tiled":
        code_spec = pl.BlockSpec(
            (1, L // 16, SUB, 128),
            lambda i: (i // r_sub, 0, i % r_sub, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        code_spec = pl.BlockSpec((code_rows, SUB, 128),
                                 lambda i: (0, i, 0),
                                 memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(NB // SUB,),
        in_specs=[
            code_spec,
            code_spec,
            vec_spec,
            vec_spec,
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(rc_t, fc_t, rl_t, fl_t)

    passed, pen, shift = outs[:3]
    out = dict(
        passed=passed.reshape(BP)[:B] != 0,
        penalty=pen.reshape(BP)[:B],
        lane_shift=shift.reshape(BP)[:B],
    )
    if want_cigar:
        out["edit_rec"] = outs[3].reshape(E + 1, BP)[:, :B]
    return out


def leap_cigar_decode(result: dict, cfg: AlignConfig):
    """Decode leap_align_pallas(want_cigar=True) edit records into the
    leap_backtrack_batch format: per pair, (edits, cigar) with edits =
    [(op, id_length, is_open), ...] in backtrack order ending with the
    terminal ('', run, False) entry, or None for pairs that did not pass.
    GLOBAL/SEMI_FREE_BEGIN lane-correction gaps (LV_BAG.cpp:254-264) are
    prepended closed-form from lane_shift."""
    import numpy as np

    from asm_tpu.kernels.leap_backtrack import edits_to_cigar

    rec = np.asarray(result["edit_rec"])  # [E+1, B]
    passed = np.asarray(result["passed"])
    shift = np.asarray(result["lane_shift"])
    E1, B = rec.shape
    opchar = {1: "M", 2: "I", 3: "D"}
    corrected = cfg.leap_mode in (LeapMode.GLOBAL, LeapMode.SEMI_FREE_BEGIN)
    out = []
    for b in range(B):
        if not passed[b]:
            out.append(None)
            continue
        edits = []
        if corrected:
            d = abs(int(shift[b]))
            gap = "D" if shift[b] > 0 else "I"
            for i in range(d):
                edits.append((gap, 0, i == d - 1))
        for ev in range(E1 - 1, 0, -1):
            w = int(rec[ev, b])
            if w & 3:
                edits.append((opchar[w & 3], w >> 3, bool(w & 4)))
        edits.append(("", int(rec[0, b]), False))
        out.append((edits, edits_to_cigar(edits)))
    return out


def leap_cigar_auto(read_codes, read_len, ref_codes, ref_len,
                    cfg: AlignConfig, *, pre_staged=False,
                    interpret: bool = False, bucket: int = 16,
                    vmem_budget: int = 12 << 20, max_tile: int | None = None,
                    decode: bool = True):
    """Fused CIGAR at ANY af_threshold via the two-pass scheme.

    The fused backtrack parks its [E+1, TL] packed history in VMEM, so a
    single kernel cannot be sized by the benchmark's af_threshold=200
    (benchmark_utils.h:289) without blowing the ~16 MB budget at full
    tile. Instead (the greedy measured-steps-cache trick, cf. bench.py):

      pass 1  leap_align_pallas penalty-only — for lv_bag the reported
              penalty of a passed pair IS its pass energy, so the batch's
              true energy bound is max(penalty * passed);
      pass 2  want_cigar with leap_max_energy = that bound rounded up to
              a multiple of `bucket` (bounds distinct compiled programs)
              and the grid tile shrunk by leap_cigar_tile until the
              history fits VMEM.

    Returns the want_cigar result dict plus "energy_bound"; decode=True
    additionally attaches "cigars" = leap_cigar_decode output. If even a
    256-pair tile cannot hold the history (energies in the many hundreds)
    the XLA full-history path takes over ([B, L] code inputs only) and
    the dict carries "cigars" without "edit_rec".
    """
    import dataclasses

    import numpy as np

    assert cfg.leap_max_energy is None, (
        "leap_cigar_auto sizes the energy bound itself; leave "
        "leap_max_energy unset"
    )
    p1 = leap_align_pallas(read_codes, read_len, ref_codes, ref_len, cfg,
                           interpret=interpret, pre_staged=pre_staged)
    pen = np.asarray(p1["penalty"])
    ps = np.asarray(p1["passed"])
    maxe = int((pen * ps).max()) if ps.any() else 0
    E = min(cfg.leap_af_threshold,
            max(bucket, -(-maxe // bucket) * bucket))
    ccfg = dataclasses.replace(cfg, leap_max_energy=E)
    tile = leap_cigar_tile(ccfg, max_tile=max_tile,
                           vmem_budget=vmem_budget)
    if tile is None:
        # extreme energy bound: XLA full-history path (leap_align keeps
        # the whole [E, TL] start/end/I/D tables in HBM, no VMEM cap)
        if pre_staged:
            raise NotImplementedError(
                "fused CIGAR history does not fit VMEM at any tile and "
                "the XLA fallback needs [B, L] codes; unpack the "
                "pre-staged corpus first"
            )
        from asm_tpu.kernels.leap import leap_align
        from asm_tpu.kernels.leap_backtrack import leap_backtrack_batch

        hist = leap_align(read_codes, read_len, ref_codes, ref_len, cfg,
                          want_history=True)
        return dict(
            passed=hist["passed"], penalty=hist["penalty"],
            lane_shift=hist["lane_shift"], energy_bound=E,
            cigars=leap_backtrack_batch(hist, cfg),
        )
    out = leap_align_pallas(read_codes, read_len, ref_codes, ref_len,
                            ccfg, interpret=interpret,
                            pre_staged=pre_staged, want_cigar=True,
                            tile=tile)
    out = dict(out, energy_bound=E)
    if decode:
        out["cigars"] = leap_cigar_decode(out, ccfg)
    return out
