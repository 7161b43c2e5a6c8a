"""Batched GASMA greedy hurdle-matrix highway alignment.

The flagship kernel — a TPU-native re-design of GASMA/hurdle_matrix.h.

The reference walks ONE pair at a time: per step it scans each of the 2k+1
lane registers with tzcnt (`first_zero`/`first_one`) and funnel-shift
popcounts. Here a whole batch advances in lock-step inside one
jax.lax.while_loop:

  * setup (once per batch): hurdle rows [B, NL, L] by shifted compare
    (ops.hurdles.build_greedy_lanes == _construct_hurdles,
    hurdle_matrix.h:441-455) and morphological denoise
    (flip_short_hurdles(1), hurdle_matrix.h:453);
  * per step: every bit query the reference answers with tzcnt/popcount
    (first_zero / first_one / pop_count_between) is a MASKED REDUCTION over
    the int8 lane rows — min-index / sum over the L axis with iota bounds
    masks, fused by XLA into single VPU passes over [B, NL, L].
    (A previous design precomputed next-index/prefix-count tables and
    gathered into them per step; TPU lowers big take_along_axis gathers
    ~50x slower than streaming reductions, so reductions win despite
    touching the whole row.)
  * the reference's sequential lane scans (_update_highway_list:325-352,
    _choose_best_highway:368-401) are order-dependent, so their running
    arg-max/min are replayed as a STATIC unrolled loop over the NL lanes
    (vectorized over the batch) with exactly the reference's tie-breaking;
  * pairs finish at different steps: a done-mask freezes finished pairs
    while the while_loop runs until all pairs converge (err=.05 corpora
    converge in <= ~8 steps; bound cfg.steps_bound is the hard stop).

Semantics are bit-faithful to the scalar emulator
asm_tpu.reference_impl.greedy_ref (see its docstring for the reference
quirks deliberately reproduced, and the one documented deviation:
deterministic sentinel padding past string ends).

CIGAR: each iteration records only (lane delta, columns advanced) into one
[B, 1] column of compact step buffers; the [B, 2T+2] (op, run) slot arrays
are materialized vectorized AFTER the loop (slots with run 0 are empty and
skipped at decode). The reference appends to a std::string per step
(_update_CIGAR, hurdle_matrix.h:238-251); op codes: 1 '=', 2 'X', 3 'I',
4 'D', 5 'M'.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from asm_tpu.config import AlignConfig, AlignmentType
from asm_tpu.ops.bitops import flip_short_hurdles
from asm_tpu.ops.packed import (
    pack_rows,
    first_set_from,
    count_range as packed_count_range,
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

_NEG_INF32 = -(2**31) + 1  # plain int: import must not init the backend


@functools.partial(jax.jit, static_argnames=("cfg",))
def greedy_align(read_codes, read_len, ref_codes, ref_len, cfg: AlignConfig):
    """Greedy highway alignment over a batch.

    Args:
      read_codes/ref_codes: int8[B, L] sentinel-padded 2-bit codes.
      read_len/ref_len: int32[B].
      cfg: AlignConfig (k, x, o, e, alignment_type, priors...).

    Returns dict with:
      cost: int32[B] total penalty (hurdle_matrix.h get_cost :677)
      cigar_ops / cigar_runs: int8/int32 [B, C] fixed-slot buffers
        (slots with run == 0 are empty; decode skips them)
      cigar_count: int32[B] number of non-empty slots
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

    # --- setup: hurdle rows (hurdle_matrix.h:441-455), then bit-pack ---
    # The loop below only ever touches the PACKED rows ([B, NL, L/32]
    # uint32) — the batched equivalent of the reference's int_128bit lane
    # registers; queries are popcount/ctz word math (asm_tpu.ops.packed).
    orig_b = build_greedy_lanes(read_codes, ref_codes, k) != 0  # bool[B,NL,L]
    den_b = flip_short_hurdles(orig_b.astype(jnp.int8), cfg.flip_threshold) != 0
    orig = pack_rows(orig_b)  # uint32[B, NL, W]
    den = pack_rows(den_b)
    den_zero = pack_rows(~den_b)

    def first_index(rows_packed, from_col):
        """min p >= from_col with a set bit, else L — every first_zero /
        first_one tzcnt query (GASMA/utils.h:168-191)."""
        return first_set_from(rows_packed, from_col)

    def count_range(rows_packed, lo, hi):
        """popcount in [lo, hi) — pop_count_between (GASMA/utils.h:263-270);
        out-of-range or inverted windows count 0 like the reference clamp."""
        return packed_count_range(rows_packed, lo, hi)

    dest = lane_destination(m[:, None], n[:, None], lanes_idx[None, :])  # [B, NL]
    dest_lane = n - m  # [B]
    in_band = jnp.abs(dest_lane) <= k

    def pick(arr, li):
        """arr[b, li[b]] for [B, NL] arrays — one-hot sum instead of a
        take_along_axis gather (TPU lowers even [B, 7] gathers poorly)."""
        onehot = jnp.arange(NL, dtype=jnp.int32)[None, :] == li[:, None]
        return jnp.sum(jnp.where(onehot, arr, jnp.zeros((), arr.dtype)), axis=1)

    state = dict(
        cur_lane=jnp.zeros((B,), jnp.int32),
        cur_col=jnp.zeros((B,), jnp.int32),
        cost=jnp.zeros((B,), jnp.int32),
        done=jnp.zeros((B,), bool),
        # highway cache (highways::reset, hurdle_matrix.h:106-119)
        sp=jnp.full((B, NL), -1, jnp.int32),
        hlen=jnp.zeros((B, NL), jnp.int32),
        nsw=jnp.full((B, NL), L, jnp.int32),
        # per-step records (lane delta, columns advanced) — CIGAR source.
        # [T, B] layout: each iteration writes one contiguous [1, B] row
        step_dl=jnp.zeros((cfg.steps_bound, B), jnp.int8),
        step_dist=jnp.zeros((cfg.steps_bound, B), jnp.int16),
        steps=jnp.zeros((B,), jnp.int32),
        it=jnp.int32(0),
    )

    def cond(s):
        return (s["it"] < cfg.steps_bound) & jnp.any(~s["done"])

    def take_lane(arr, li):
        """arr[b, li[b], :] without a gather: one-hot over the tiny NL axis."""
        onehot = lanes_onehot(li)  # [B, NL, 1]
        zero = jnp.zeros((), arr.dtype)
        return jnp.sum(jnp.where(onehot, arr, zero), axis=1)

    def lanes_onehot(li):
        ids = jnp.arange(NL, dtype=jnp.int32)[None, :, None]
        return ids == li[:, None, None]

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

        fz = first_index(den_zero, start_col)
        sp_new = jnp.where(start_col > L, start_col, fz)
        no_g = first_index(den, sp_new)
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
        nhur = count_range(orig, start_col, sp + hlen)  # [B, NL]
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

        best_len = pick(hlen, best_li)
        valid = best_len > 0  # else: terminate without a step (:358-361)

        # ---- _choose_best_highway (hurdle_matrix.h:368-401) ----
        best_lane_v = best_li - k  # lane number
        sp_b = pick(sp, best_li)
        swc_b = pick(swc, best_li)
        hc_b = pick(hc, best_li)
        row_b = take_lane(orig, best_li)[:, None, :]  # [B, 1, W] best lane row

        # vectorized per-lane costs (one masked reduction each), then the
        # reference's order-dependent running-minimum replayed over NL
        ep = sp + hlen  # [B, NL]
        # NOTE: the reference adds the RAW popcount here, not x * popcount
        # (hurdle_matrix.h:389 intermediate_cost) — unlike hurdle_cost
        # above; its window [start_col, ep) is exactly nhur's, so reuse it
        ic_all = swc + nhur  # [B, NL]
        fwd_lb = switch_forward_column(lanes_idx[None, :], best_lane_v[:, None])
        cross = count_range(row_b, fwd_lb + ep, sp_b[:, None])
        tc_all = (
            ic_all
            + switch_lane_penalty(lanes_idx[None, :], best_lane_v[:, None], o, e)
            + jnp.maximum(0, x * cross)
        )
        skip_all = (
            (jnp.arange(NL, dtype=jnp.int32)[None, :] == best_li[:, None])
            | (sp + fwd_lb > sp_b[:, None])
        )

        stc = swc_b + hc_b
        sic = stc
        bil = best_li
        for li in range(NL):
            tc = tc_all[:, li]
            ic = ic_all[:, li]
            upd = ~skip_all[:, li] & (tc <= stc) & (ic <= sic)
            stc = jnp.where(upd, tc, stc)
            sic = jnp.where(upd, ic, sic)
            bil = jnp.where(upd, li, bil)

        # ---- commit the step (_step, hurdle_matrix.h:407-434) ----
        bl_lane = bil - k
        sp_c = pick(sp, bil)
        len_c = pick(hlen, bil)
        swc_c = pick(swc, bil)
        hc_c = pick(hc, bil)
        move = act & valid

        cost = s["cost"] + jnp.where(move, swc_c + hc_c, 0)
        distance = sp_c + len_c - (
            cur_col + switch_forward_column(cur_lane, bl_lane)
        )

        # record the step compactly: (lane delta, columns advanced) — one
        # [B, 1] column write each; CIGAR slots are materialized AFTER the
        # loop in one vectorized pass (keeps the loop carry tiny)
        dl = bl_lane - cur_lane
        it = s["it"]
        step_dl = jax.lax.dynamic_update_slice(
            s["step_dl"],
            jnp.where(move, dl, 0).astype(jnp.int8)[None, :],
            (it, jnp.int32(0)),
        )
        step_dist = jax.lax.dynamic_update_slice(
            s["step_dist"],
            jnp.where(move, distance, 0).astype(jnp.int16)[None, :],
            (it, jnp.int32(0)),
        )

        new_lane = jnp.where(move, bl_lane, cur_lane)
        new_col = jnp.where(move, sp_c + len_c, cur_col)
        dest_new = pick(dest, new_lane + k)
        done = s["done"] | (act & ~valid) | (move & (new_col >= dest_new))

        # int32 casts keep carry dtypes stable when jax_enable_x64 is on
        # (exact_floats runs need it): weak-typed Python-int arithmetic
        # would otherwise promote cost/cur_col to int64 mid-loop.
        return dict(
            cur_lane=new_lane.astype(jnp.int32),
            cur_col=new_col.astype(jnp.int32),
            cost=cost.astype(jnp.int32),
            done=done,
            sp=sp.astype(jnp.int32),
            hlen=hlen.astype(jnp.int32),
            nsw=nsw.astype(jnp.int32),
            step_dl=step_dl,
            step_dist=step_dist,
            steps=s["steps"] + move.astype(jnp.int32),
            it=s["it"] + 1,
        )

    s = jax.lax.while_loop(cond, body, state)

    # ---- final leap to the destination (run(), hurdle_matrix.h:574-590) ----
    cur_lane, cur_col = s["cur_lane"], s["cur_col"]
    dl_c = jnp.clip(dest_lane, -k, k)
    dest_col = pick(dest, dl_c + k)
    row_dl = take_lane(orig, dl_c + k)  # [B, W] destination-lane row
    lo = cur_col + switch_forward_column(cur_lane, dest_lane)
    distance = count_range(row_dl, lo, dest_col)
    distance = jnp.where(in_band, distance, 0)  # out-of-band: stale dest <= 0
    needs = jnp.where(
        in_band,
        (cur_lane != dest_lane) | (cur_col < dest_col),
        cur_lane != dest_lane,
    )
    sc = switch_lane_penalty(cur_lane, dest_lane, o, e) if is_global else 0
    cost = s["cost"] + jnp.where(needs, sc + jnp.maximum(0, x * distance), 0)

    dl = dest_lane - cur_lane
    leap_run_f = jnp.where(needs & (dl != 0), jnp.abs(dl), 0)
    m_run_f = jnp.where(needs & (distance > 0), distance, 0)

    # ---- materialize CIGAR slot buffers from the step records ----
    # slot 2t   : leap op (I if the step moved down a lane, else D)
    # slot 2t+1 : merged match-or-mismatch 'M' run
    # empty slots carry run 0 and are skipped at decode.
    T = cfg.steps_bound
    sdl = s["step_dl"].T.astype(jnp.int32)  # [B, T]
    sdist = s["step_dist"].T.astype(jnp.int32)
    ops_even = jnp.where(sdl < 0, OP_I, OP_D).astype(jnp.int8)
    runs_even = jnp.abs(sdl)
    ops_odd = jnp.full((B, T), OP_M, jnp.int8)
    runs_odd = sdist
    ops_steps = jnp.stack([ops_even, ops_odd], axis=2).reshape(B, 2 * T)
    runs_steps = jnp.stack([runs_even, runs_odd], axis=2).reshape(B, 2 * T)
    op_leap_f = jnp.where(dl < 0, OP_I, OP_D).astype(jnp.int8)
    ops_ = jnp.concatenate(
        [ops_steps, op_leap_f[:, None], jnp.full((B, 1), OP_M, jnp.int8)],
        axis=1,
    )
    runs_ = jnp.concatenate(
        [runs_steps, leap_run_f[:, None], m_run_f[:, None]], axis=1
    )

    return dict(
        cost=cost,
        cigar_ops=ops_,
        cigar_runs=runs_,
        cigar_count=jnp.sum(runs_ > 0, axis=1, dtype=jnp.int32),
        steps=s["steps"],
        # cursor state at loop exit (before the final leap) — debug aid
        final_lane=cur_lane,
        final_col=cur_col,
    )
