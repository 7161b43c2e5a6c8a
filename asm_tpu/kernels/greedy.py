"""Batched GASMA greedy hurdle-matrix highway alignment.

The flagship kernel — a TPU-native re-design of GASMA/hurdle_matrix.h.

The reference walks ONE pair at a time: per step it scans each of the 2k+1
lane registers with tzcnt (`first_zero`/`first_one`) and funnel-shift
popcounts. Here a whole batch advances in lock-step inside one
jax.lax.while_loop:

  * setup (once per batch): hurdle rows [B, NL, L] by shifted compare
    (ops.hurdles.build_greedy_lanes == _construct_hurdles,
    hurdle_matrix.h:441-455), morphological denoise (flip_short_hurdles(1),
    hurdle_matrix.h:453), then THREE scan structures that turn every
    per-step bit query into an O(1) gather:
       next_zero/next_one over the denoised rows  (all first_zero/first_one)
       prefix popcount over the raw rows          (all pop_count_between)
  * per step: every lane of every pair is scored in one vectorized pass
    ([B, NL] arithmetic); the reference's sequential lane scans
    (_update_highway_list:325-352, _choose_best_highway:382-399) are
    order-dependent, so their running arg-max/min are replayed as a STATIC
    unrolled loop over the NL lanes (vectorized over the batch) with exactly
    the reference's tie-breaking;
  * pairs finish at different steps: a done-mask freezes finished pairs
    while the while_loop runs until all pairs converge (a highway step
    always advances >= 1 column, so at most L iterations).

Semantics are bit-faithful to the scalar emulator
asm_tpu.reference_impl.greedy_ref (see its docstring for the reference
quirks deliberately reproduced, and the one documented deviation:
deterministic sentinel padding past string ends).

CIGAR is emitted on the fly into a fixed [B, C] (op, run) buffer — the
reference appends to a std::string per step (_update_CIGAR,
hurdle_matrix.h:238-251); op codes: 1 '=', 2 'X', 3 'I', 4 'D', 5 'M'.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from asm_tpu.config import AlignConfig, AlignmentType
from asm_tpu.ops.bitops import (
    flip_short_hurdles,
    next_one_index,
    next_zero_index,
    prefix_count,
    count_between,
    gather_last,
)
from asm_tpu.ops.hurdles import (
    build_greedy_lanes,
    lane_destination,
    switch_lane_penalty,
    switch_forward_column,
)

OP_M = 5  # greedy emits merged match-or-mismatch runs ('M')
OP_I = 3
OP_D = 4

_NEG_INF32 = jnp.int32(-(2**31) + 1)


def _emit(ops, runs, cnt, op_val, run_val, mask):
    """Append (op, run) at position cnt for rows where mask; bump cnt."""
    B, C = ops.shape
    rows = jnp.arange(B, dtype=jnp.int32)
    pos = jnp.minimum(cnt, C - 1)
    old_op = ops[rows, pos]
    old_run = runs[rows, pos]
    ops = ops.at[rows, pos].set(
        jnp.where(mask, op_val, old_op).astype(ops.dtype)
    )
    runs = runs.at[rows, pos].set(
        jnp.where(mask, run_val, old_run).astype(runs.dtype)
    )
    cnt = cnt + mask.astype(jnp.int32)
    return ops, runs, cnt


@functools.partial(jax.jit, static_argnames=("cfg",))
def greedy_align(read_codes, read_len, ref_codes, ref_len, cfg: AlignConfig):
    """Greedy highway alignment over a batch.

    Args:
      read_codes/ref_codes: int8[B, L] sentinel-padded 2-bit codes.
      read_len/ref_len: int32[B].
      cfg: AlignConfig (k, x, o, e, alignment_type, priors...).

    Returns dict with:
      cost: int32[B] total penalty (hurdle_matrix.h get_cost :677)
      cigar_ops / cigar_runs: int8/int32 [B, C] (op codes above)
      cigar_count: int32[B]
      steps: int32[B] number of highway steps taken
    """
    B, L = read_codes.shape
    k = cfg.k
    NL = cfg.num_lanes
    x, o, e = cfg.x, cfg.o, cfg.e
    is_global = cfg.alignment_type == AlignmentType.GLOBAL
    fdt = jnp.float64 if cfg.exact_floats else jnp.float32
    match_sig, mismatch_sig, indel_sig = cfg.significance

    m = jnp.minimum(read_len.astype(jnp.int32), L)
    n = jnp.minimum(ref_len.astype(jnp.int32), L)

    lanes_idx = jnp.arange(-k, k + 1, dtype=jnp.int32)  # [NL]

    # --- setup: hurdle rows + scan structures (hurdle_matrix.h:441-455) ---
    orig = build_greedy_lanes(read_codes, ref_codes, k)  # [B, NL, L]
    den = flip_short_hurdles(orig, cfg.flip_threshold)
    nz = next_zero_index(den)  # [B, NL, L+1]
    no = next_one_index(den)
    cum = prefix_count(orig)  # [B, NL, L+1]

    dest = lane_destination(m[:, None], n[:, None], lanes_idx[None, :])  # [B, NL]
    dest_lane = n - m  # [B]
    in_band = jnp.abs(dest_lane) <= k

    C = cfg.cigar_ops_bound

    state = dict(
        cur_lane=jnp.zeros((B,), jnp.int32),
        cur_col=jnp.zeros((B,), jnp.int32),
        cost=jnp.zeros((B,), jnp.int32),
        done=jnp.zeros((B,), bool),
        # highway cache (highways::reset, hurdle_matrix.h:106-119)
        sp=jnp.full((B, NL), -1, jnp.int32),
        hlen=jnp.zeros((B, NL), jnp.int32),
        nsw=jnp.full((B, NL), L, jnp.int32),
        cigar_ops=jnp.zeros((B, C), jnp.int8),
        cigar_runs=jnp.zeros((B, C), jnp.int32),
        cigar_cnt=jnp.zeros((B,), jnp.int32),
        steps=jnp.zeros((B,), jnp.int32),
        it=jnp.int32(0),
    )

    def cond(s):
        return (s["it"] < cfg.steps_bound) & jnp.any(~s["done"])

    def body(s):
        act = ~s["done"]  # [B]
        cur_lane = s["cur_lane"]
        cur_col = s["cur_col"]
        sp, hlen, nsw = s["sp"], s["hlen"], s["nsw"]

        # ---- _update_highway_list (hurdle_matrix.h:285-362) ----
        start_col = cur_col[:, None] + switch_forward_column(
            cur_lane[:, None], lanes_idx[None, :]
        )  # [B, NL]
        recomp = (sp < start_col) & act[:, None]

        sc_c = jnp.minimum(start_col, L)
        nz_g = gather_last(nz, sc_c)  # first zero >= start_col (denoised)
        sp_new = jnp.where(start_col > L, start_col, nz_g)
        no_g = gather_last(no, jnp.minimum(sp_new, L))
        # register-width semantics: empty scan returns L (utils.h:168-182)
        raw_len = jnp.where((sp_new >= L) | (no_g >= L), L, no_g - sp_new)
        clamp = sp_new + raw_len > dest
        len_new = jnp.where(clamp, jnp.maximum(dest - sp_new, 0), raw_len)

        sp = jnp.where(recomp, sp_new, sp)
        hlen = jnp.where(recomp, len_new, hlen)
        nsw = jnp.where(
            recomp, jnp.abs(lanes_idx[None, :] - cur_lane[:, None]), nsw
        )
        reaching = jnp.any(recomp & clamp, axis=1)  # [B]

        if is_global:
            swc = switch_lane_penalty(cur_lane[:, None], lanes_idx[None, :], o, e)
        else:
            first = s["it"] == 0
            swc = jnp.where(
                first,
                0,
                switch_lane_penalty(cur_lane[:, None], lanes_idx[None, :], o, e),
            )
        nhur = count_between(cum, start_col, sp + hlen)  # [B, NL]
        hc = x * nhur

        # selection scan (hurdle_matrix.h:325-352) — static unroll over lanes
        sig = (
            match_sig * hlen.astype(fdt)
            + mismatch_sig * nhur.astype(fdt)
            + indel_sig * nsw.astype(fdt)
        )
        current_cost = -(swc + hc)
        fsc = (
            switch_lane_penalty(lanes_idx[None, :], dest_lane[:, None], o, e)
            if is_global
            else jnp.zeros_like(swc)
        )
        h_reach = (current_cost - fsc - x * (dest - sp - hlen)).astype(fdt)
        h_all = jnp.where(reaching[:, None], h_reach, sig)
        lh_all = -swc - jnp.where(reaching[:, None], fsc, 0)

        best_h = jnp.full((B,), -jnp.inf, fdt)
        best_lh = jnp.full((B,), _NEG_INF32, jnp.int32)
        best_li = jnp.zeros((B,), jnp.int32)  # lane array index of best
        for li in range(NL):
            h = h_all[:, li]
            lh = lh_all[:, li]
            better = (h > best_h) | ((h == best_h) & (lh > best_lh))
            best_h = jnp.where(better, h, best_h)
            best_lh = jnp.where(better, lh, best_lh)
            best_li = jnp.where(better, li, best_li)

        best_len = jnp.take_along_axis(hlen, best_li[:, None], 1)[:, 0]
        valid = best_len > 0  # else: terminate without a step (:358-361)

        # ---- _choose_best_highway (hurdle_matrix.h:368-401) ----
        best_lane_v = best_li - k  # lane number
        sp_b = jnp.take_along_axis(sp, best_li[:, None], 1)[:, 0]
        swc_b = jnp.take_along_axis(swc, best_li[:, None], 1)[:, 0]
        hc_b = jnp.take_along_axis(hc, best_li[:, None], 1)[:, 0]
        cum_b = jnp.take_along_axis(
            cum, best_li[:, None, None], 1
        )[:, 0, :]  # [B, L+1] prefix counts of the best lane's raw row

        stc = swc_b + hc_b
        sic = stc
        bil = best_li
        for li in range(NL):
            lane_v = li - k
            fwd_lb = switch_forward_column(jnp.int32(lane_v), best_lane_v)
            skip = (li == best_li) | (sp[:, li] + fwd_lb > sp_b)
            ep = sp[:, li] + hlen[:, li]
            ic = swc[:, li] + count_between(
                cum[:, li, :],
                cur_col + switch_forward_column(cur_lane, jnp.int32(lane_v)),
                ep,
            )
            tc = (
                ic
                + switch_lane_penalty(jnp.int32(lane_v), best_lane_v, o, e)
                + jnp.maximum(
                    0, x * count_between(cum_b, fwd_lb + ep, sp_b)
                )
            )
            upd = ~skip & (tc <= stc) & (ic <= sic)
            stc = jnp.where(upd, tc, stc)
            sic = jnp.where(upd, ic, sic)
            bil = jnp.where(upd, li, bil)

        # ---- commit the step (_step, hurdle_matrix.h:407-434) ----
        bl_lane = bil - k
        sp_c = jnp.take_along_axis(sp, bil[:, None], 1)[:, 0]
        len_c = jnp.take_along_axis(hlen, bil[:, None], 1)[:, 0]
        swc_c = jnp.take_along_axis(swc, bil[:, None], 1)[:, 0]
        hc_c = jnp.take_along_axis(hc, bil[:, None], 1)[:, 0]
        move = act & valid

        cost = s["cost"] + jnp.where(move, swc_c + hc_c, 0)
        distance = sp_c + len_c - (
            cur_col + switch_forward_column(cur_lane, bl_lane)
        )

        # CIGAR: leap (I/D) then merged run (M) — hurdle_matrix.h:238-251
        dl = bl_lane - cur_lane
        op_leap = jnp.where(dl < 0, OP_I, OP_D).astype(jnp.int8)
        ops_, runs_, cnt_ = _emit(
            s["cigar_ops"],
            s["cigar_runs"],
            s["cigar_cnt"],
            op_leap,
            jnp.abs(dl),
            move & (dl != 0),
        )
        ops_, runs_, cnt_ = _emit(
            ops_, runs_, cnt_, jnp.int8(OP_M), distance, move & (distance > 0)
        )

        new_lane = jnp.where(move, bl_lane, cur_lane)
        new_col = jnp.where(move, sp_c + len_c, cur_col)
        dest_new = jnp.take_along_axis(dest, (new_lane + k)[:, None], 1)[:, 0]
        done = s["done"] | (act & ~valid) | (move & (new_col >= dest_new))

        return dict(
            cur_lane=new_lane,
            cur_col=new_col,
            cost=cost,
            done=done,
            sp=sp,
            hlen=hlen,
            nsw=nsw,
            cigar_ops=ops_,
            cigar_runs=runs_,
            cigar_cnt=cnt_,
            steps=s["steps"] + move.astype(jnp.int32),
            it=s["it"] + 1,
        )

    s = jax.lax.while_loop(cond, body, state)

    # ---- final leap to the destination (run(), hurdle_matrix.h:574-590) ----
    cur_lane, cur_col = s["cur_lane"], s["cur_col"]
    dl_c = jnp.clip(dest_lane, -k, k)
    dest_col = jnp.take_along_axis(dest, (dl_c + k)[:, None], 1)[:, 0]
    cum_dl = jnp.take_along_axis(cum, (dl_c + k)[:, None, None], 1)[:, 0, :]
    distance = count_between(
        cum_dl, cur_col + switch_forward_column(cur_lane, dest_lane), dest_col
    )
    distance = jnp.where(in_band, distance, 0)  # out-of-band: stale dest <= 0
    needs = jnp.where(
        in_band,
        (cur_lane != dest_lane) | (cur_col < dest_col),
        cur_lane != dest_lane,
    )
    sc = switch_lane_penalty(cur_lane, dest_lane, o, e) if is_global else 0
    cost = s["cost"] + jnp.where(needs, sc + jnp.maximum(0, x * distance), 0)

    dl = dest_lane - cur_lane
    op_leap = jnp.where(dl < 0, OP_I, OP_D).astype(jnp.int8)
    ops_, runs_, cnt_ = _emit(
        s["cigar_ops"],
        s["cigar_runs"],
        s["cigar_cnt"],
        op_leap,
        jnp.abs(dl),
        needs & (dl != 0),
    )
    ops_, runs_, cnt_ = _emit(
        ops_, runs_, cnt_, jnp.int8(OP_M), distance, needs & (distance > 0)
    )

    return dict(
        cost=cost,
        cigar_ops=ops_,
        cigar_runs=runs_,
        cigar_count=cnt_,
        steps=s["steps"],
    )
