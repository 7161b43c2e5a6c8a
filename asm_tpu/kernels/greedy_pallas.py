"""Fused Pallas TPU kernel for the GASMA greedy hurdle-matrix aligner.

Same semantics as asm_tpu.kernels.greedy.greedy_align (which remains the
portable XLA reference path and the conformance anchor); this kernel fuses
the ENTIRE per-pair pipeline — hurdle-row construction, morphological
denoise, bit-packing, and the greedy highway loop — into one VMEM-resident
pass, eliminating all HBM traffic between steps.

Layout: pair-per-lane ("one VPU lane owns one pair", the batched analogue
of the reference's one-SIMD-register-per-pair). A grid step processes a
tile of _TILE pairs shaped [_TILE/128, 128] (sublanes x lanes); every
per-pair scalar is one such int32 array, every hurdle-lane word one such
uint32 array (NL lanes x 4 words per pair, unrolled statically). All
first_zero / first_one / popcount queries are ctz/popcount word math
(lax.population_count — native on the VPU).

Each tile's while_loop exits when ITS OWN pairs are done, so the
worst-case step count is a per-tile max, not a global-batch max.

Inputs arrive pre-transposed as position-major uint32 SWAR words
[L/4, NB, 128] (byte j of word = code of position 4w+j — one XLA bitcast,
no layout change). The kernel packs them ONCE into two bit-planes per
sequence — bit0/bit1 of the 2-bit code, the reference's two __m128i
planes from sse3_convert2bit1 (bit_convert.cpp:248-369) — using a
carry-free multiply that compacts the four one-bit bytes of each SWAR
word into a nibble (~6 ops per 4 positions). There is NO packed validity
plane: by the encoding contract (encoding.py:12-16) sentinels start
exactly at the true length, so "position invalid" is the closed-form
length mask mask_ge(len - shift) — and the per-lane funnel shift of a
length mask is just the mask of (len - shift), so validity costs one OR
per lane row instead of a third packed plane. Each hurdle lane row is a
funnel shift of one side's two planes by |lane| bits + XOR/OR word math
(_construct_hurdles, hurdle_matrix.h:441-455). Packing lives in-kernel
because every XLA-side formulation tried (reduce over a [.., W, 32]
minor axis, bitcast+SWAR-multiply trees, transpose-then-row-OR chains)
lowered to relayout-heavy HLO that cost more than this whole kernel.
The CIGAR step records leave as one packed int16 per step — bit 0 flags
the final leap, bits 1-7 carry the in-loop lane delta biased by +64,
bits 8-15 the match advance — and are expanded to the standard (op, run)
slot buffers in XLA. int16 halves the record buffer's HBM writeback (the
output block is copied out in full per tile, early exit or not), which
is a measurable slice of the kernel's fixed cost at 33M-pair chunks.
The final leap's lane delta spans +-(L+k) (out-of-band destinations) and
does not fit the biased byte; the expansion reconstructs it as
dest_lane - sum(in-loop deltas), both of which it already has.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from asm_tpu.config import AlignConfig, AlignmentType

OP_M = 5
OP_I = 3
OP_D = 4

import os as _os

# pairs per grid step: [_SUB, 128]. 2048 default; ASM_GREEDY_TILE=4096
# doubles the block (bigger contiguous DMAs with the tiled layout, more
# VMEM pressure) — an experiment knob, read once at import.
_TILE = int(_os.environ.get("ASM_GREEDY_TILE", 2048))
_SUB = _TILE // 128
FULL = 0xFFFFFFFF
# count_range sentinel: "the lo bound is 0, skip the lo AND entirely"
# (a dedicated object compared with `is` so a typo can never silently
# drop the bound the way a stray string would)
_FULL_MASK = object()


def _ctz32(w):
    low = w & (~w + jnp.uint32(1))
    return jax.lax.population_count(low - jnp.uint32(1)).astype(jnp.int32)


def _rec_dtype(cfg: AlignConfig):
    """int16 step records when the fields fit (flag 1 bit, in-loop lane
    delta + 64 in 7 bits, advance in 8) — halves the record block's HBM
    writeback; int32 otherwise (long sequences / very wide bands)."""
    if cfg.max_len <= 255 and 2 * cfg.k <= 62:
        return jnp.int16
    return jnp.int32


def _greedy_kernel(cfg: AlignConfig, planes: bool, rc_ref, fc_ref, rl_ref,
                   fl_ref, cost_ref, steps_ref, rec_ref, st_ref, lane_ref):
    k = cfg.k
    NL = cfg.num_lanes
    L = cfg.max_len
    W = L // 32
    rec_dt = _rec_dtype(cfg)
    x, o, e = cfg.x, cfg.o, cfg.e
    is_global = cfg.alignment_type == AlignmentType.GLOBAL
    match_sig, mismatch_sig, indel_sig = cfg.significance
    T = cfg.steps_bound

    m = jnp.minimum(rl_ref[...], L)
    n = jnp.minimum(fl_ref[...], L)
    shape = m.shape  # [_SUB, 128]

    # ---- packed-word masks (shared by pack, hurdle build, queries) ------
    def mask_ge(c, w):
        low = jnp.clip(c - 32 * w, 0, 32)
        msk = jnp.uint32(FULL) << jnp.minimum(low, 31).astype(jnp.uint32)
        return jnp.where(low >= 32, jnp.uint32(0), msk)

    def masks_ge(c):
        return [mask_ge(c, w) for w in range(W)]

    # ---- pack SWAR code words into bit-planes, once per tile ------------
    # bit p of output word w = position 32*w + p (the reference's
    # little-endian plane order, sse3_convert2bit1). Input word j carries
    # codes of positions 4j..4j+3 in its bytes; one AND isolates bit0 (or
    # bit1) of each byte at bit {0,8,16,24}, and the carry-free multiply
    # by 0x01020408 lands those four bits contiguously at 24..27 with no
    # colliding partial products (nothing else reaches bits 24..31).
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

    if planes == "lanes":
        # pre_staged="lanes": the inputs ARE the finished hurdle rows
        # (stage_lanes_t), split across the two code inputs — the whole
        # plane/funnel/validity build below is skipped
        NL_ = cfg.num_lanes
        H = (NL_ * W + 1) // 2

        def lane_row(idx):
            return rc_ref[idx] if idx < H else fc_ref[idx - H]

        r_pl = f_pl = None
    elif planes == "tiled":
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

    # ---- build hurdle rows from the packed planes -----------------------
    # Per lane, ONE side's planes are funnel-shifted right by |lane| bits
    # (shift toward position 0 — the reference's shift_right on its
    # bit-planes, hurdle_matrix.h:444-449); hurdle = (bit0 planes differ)
    # | (bit1 planes differ) | (either position invalid). Validity is
    # closed-form: position p of the shifted-by-s sequence is valid iff
    # p < len - s, i.e. invalid = mask_ge(len - s) — every padding /
    # overhang position becomes a hurdle, deterministic where the
    # reference compares stale buffer bytes (hurdle_matrix.h:497), and
    # zeros funnel-shifted in past word W-1 land at positions >= L - s
    # >= len - s, so they too read as hurdles (the PAD_SHIFT semantics).
    # inv(s) = mask_ge(len - s) = inv(s-1) funnel-shifted down one bit
    # with the register's top bit refilled (len <= L so bit L-1 is always
    # invalid at s >= 1; all-ones rows stay all-ones) — 3 word ops per
    # extra shift instead of a fresh mask_ge chain per (side, s)
    def inv_chain(base_len):
        out = [masks_ge(base_len)]
        for s in range(1, k + 1):
            prev = out[-1]
            nxt = [
                (prev[w] >> jnp.uint32(1))
                | ((prev[w + 1] << jnp.uint32(31)) if w + 1 < W
                   else jnp.uint32(0x80000000))
                for w in range(W)
            ]
            out.append(nxt)
        return out

    if planes != "lanes":
        inv_r = inv_chain(m)
        inv_f = inv_chain(n)

    def funnel(words, s):
        """Shift a packed row right by s bits: result bit p = input bit p+s."""
        if s == 0:
            return words
        return [
            (words[w] >> jnp.uint32(s))
            | ((words[w + 1] << jnp.uint32(32 - s)) if w + 1 < W else zero_u)
            for w in range(W)
        ]

    if planes == "lanes":
        orig = [[lane_row(li * W + w) for w in range(W)]
                for li in range(NL)]
    else:
        orig = []  # [NL][W] uint32 [_SUB, 128]
        for lane in range(-k, k + 1):
            a_off = max(-lane, 0)
            b_off = max(lane, 0)
            a0, a1 = (funnel(p, a_off) for p in r_pl)
            b0, b1 = (funnel(p, b_off) for p in f_pl)
            orig.append([
                (a0[w] ^ b0[w]) | (a1[w] ^ b1[w])
                | inv_r[a_off][w] | inv_f[b_off][w]
                for w in range(W)
            ])

    # ---- denoise: flip_short_hurdles(1) -> den; highways = ~den ----
    if cfg.flip_threshold != 1:
        raise NotImplementedError(
            "pallas greedy supports flip_threshold=1 (the reference's "
            "value); use the XLA path otherwise"
        )
    if cfg.exact_floats:
        raise NotImplementedError(
            "pallas greedy computes the significance heuristic in float32 "
            "only; use the XLA path for exact_floats (float64) runs"
        )
    den = []
    for li in range(NL):
        h = orig[li]
        words = []
        for w in range(W):
            lo_prev = h[w - 1] >> 31 if w > 0 else jnp.zeros(shape, jnp.uint32)
            hi_next = h[w + 1] << 31 if w < W - 1 else jnp.zeros(shape, jnp.uint32)
            near = ((h[w] << 1) | lo_prev) | ((h[w] >> 1) | hi_next)
            words.append(h[w] & near)
        den.append(words)

    # ---- packed-word queries -------------------------------------------
    def count_range(words, lo, hi, lo_masks=None):
        # lo_masks=_FULL_MASK = mask_ge(0) (all-ones): skip the lo AND
        cnt = jnp.zeros(shape, jnp.int32)
        for w in range(W):
            hi_m = ~mask_ge(hi, w)
            if lo_masks is _FULL_MASK:
                msk = hi_m
            else:
                lm = lo_masks[w] if lo_masks is not None else mask_ge(lo, w)
                msk = lm & hi_m
            cnt = cnt + jax.lax.population_count(words[w] & msk).astype(
                jnp.int32
            )
        return cnt

    def sfc(l1, l2):  # switch_forward_column
        a1, a2 = jnp.abs(l1), jnp.abs(l2)
        return jnp.where(l1 * l2 >= 0, jnp.maximum(a1 - a2, 0), a1)

    def slp(l1, l2):  # switch_lane_penalty
        d = jnp.abs(l1 - l2)
        return jnp.where(d == 0, 0, o + e * (d - 1))

    # ---- per-lane destinations (lane_destination) ----------------------
    dest = []
    ge = m >= n
    for lane in range(-k, k + 1):
        # `lane` is a Python static: branch at trace time
        if lane > 0:
            dest_ge = n - lane
        else:
            dest_ge = jnp.where(lane >= n - m, n, m + lane)
        if lane < 0:
            dest_lt = m + lane
        else:
            dest_lt = jnp.where(lane <= n - m, m, n - lane)
        dest.append(jnp.where(ge, dest_ge, dest_lt))
    dest_lane = n - m
    in_band = jnp.abs(dest_lane) <= k

    # zero the record buffer (unwritten rows must decode to empty slots)
    rec_ref[...] = jnp.zeros((T + 1,) + shape, rec_dt)

    zero = jnp.zeros(shape, jnp.int32)

    # All vector loop state lives in VMEM scratch (st_ref rows + lane_ref
    # planes); the while carry is ONLY the scalar iteration counter —
    # Mosaic's layout inference mis-handles some vector while-carries
    # ("invalid relayout: replicated destination"), scratch refs dodge it.
    # st_ref rows: 0 cur_lane, 1 cur_col, 2 cost, 3 done, 4 steps
    # lane_ref planes: [0, NL) sp, [NL, 2NL) hlen, [2NL, 3NL) nsw
    #
    # Iteration 0 is PEELED (step(0, first=True) below): the initial state
    # is static — cur_lane=0, cur_col=0, sp=-1, done=false — so start_col
    # is 0 for every lane and the masks_ge(sc) chains, the u = den | ~mge
    # row builds, the sfc()s, and every rc_/act select constant-fold away
    # (~50 vector ops/lane, the bulk of the "first sweep" fixed cost the
    # A/B probes blamed). The while_loop then starts at it=1 with state in
    # the scratch refs, exactly as the unpeeled loop would have left it.

    def cond(it):
        pending = jnp.sum(1 - st_ref[3])
        return (it < T) & (pending > 0)

    def step(it, first):
        if first:
            # static initial state: every read below folds at trace time
            cur_lane = zero
            cur_col = zero
            cost = zero
            done = jnp.zeros(shape, jnp.bool_)
            steps = zero
        else:
            cur_lane = st_ref[0]
            cur_col = st_ref[1]
            cost = st_ref[2]
            done = st_ref[3] != 0
            steps = st_ref[4]
            sp = [lane_ref[li] for li in range(NL)]
            hlen = [lane_ref[NL + li] for li in range(NL)]
            nsw = [lane_ref[2 * NL + li] for li in range(NL)]
            act = ~done

        # ---- _update_highway_list ----
        start_col = []
        sc_masks = []  # mask_ge(start_col) per lane, shared by 3 queries
        if first:
            sp_n = [None] * NL
            hlen_n = [None] * NL
            nsw_n = [None] * NL
        else:
            sp_n, hlen_n, nsw_n = list(sp), list(hlen), list(nsw)
        reaching = jnp.zeros(shape, jnp.bool_)
        for li in range(NL):
            lane = li - k
            if first:
                # sc = 0 + sfc(0, lane) = 0; masks_ge(0) is all-ones, so
                # u = den and count_range needs no lo mask (_FULL_MASK)
                sc = zero
                sc_masks.append(_FULL_MASK)
                u = den[li]
            else:
                sc = cur_col + sfc(cur_lane, lane)
                rc_ = (sp[li] < sc) & act
                mge_sc = masks_ge(sc)
                sc_masks.append(mge_sc)
                # fused first_zero + next first_one in ONE pass over the
                # row: u = den with every bit below sc forced to 1, so u's
                # trailing ones run exactly through fz-1 (den bits in
                # [sc, fz) are all ones by fz's definition). The multiword
                # increment u+1 clears that run, hence u & (u+1) = den
                # restricted to bits > fz — the second query's operand
                # without building masks_ge(fz).
                u = [den[li][w] | ~mge_sc[w] for w in range(W)]
            fz = jnp.full(shape, L, jnp.int32)
            for w in range(W):
                nu = ~u[w]  # = ~den & mask_ge(sc)
                idx = 32 * w + _ctz32(nu)
                fz = jnp.minimum(fz, jnp.where(nu == 0, L, idx))
            carry = jnp.ones(shape, jnp.uint32)
            no_g = jnp.full(shape, L, jnp.int32)
            for w in range(W):
                s_w = u[w] + carry
                carry = carry & (s_w == 0).astype(jnp.uint32)
                v_w = u[w] & s_w
                idx = 32 * w + _ctz32(v_w)
                no_g = jnp.minimum(no_g, jnp.where(v_w == 0, L, idx))
            sp_new = fz if first else jnp.where(sc > L, sc, fz)
            raw_len = jnp.where((sp_new >= L) | (no_g >= L), L, no_g - sp_new)
            clamp = sp_new + raw_len > dest[li]
            len_new = jnp.where(
                clamp, jnp.maximum(dest[li] - sp_new, 0), raw_len
            )
            if first:
                # rc_ = (sp=-1 < sc=0) & act(all) = true: unconditional
                sp_n[li] = sp_new
                hlen_n[li] = len_new
                nsw_n[li] = jnp.full(shape, abs(lane), jnp.int32)
                reaching = reaching | clamp
            else:
                sp_n[li] = jnp.where(rc_, sp_new, sp[li])
                hlen_n[li] = jnp.where(rc_, len_new, hlen[li])
                nsw_n[li] = jnp.where(rc_, jnp.abs(lane - cur_lane), nsw[li])
                reaching = reaching | (rc_ & clamp)
            start_col.append(sc)

        swc, hc, nhur = [], [], []
        for li in range(NL):
            lane = li - k
            if first:
                # slp(0, lane) is a trace-time constant; the non-global
                # branch zeroes it at it==0 anyway
                pen = 0 if lane == 0 else o + e * (abs(lane) - 1)
                sc_pen = zero + (pen if is_global else 0)
            elif is_global:
                sc_pen = slp(cur_lane, lane)
            else:
                sc_pen = jnp.where(it == 0, 0, slp(cur_lane, lane))
            nh = count_range(orig[li], start_col[li], sp_n[li] + hlen_n[li],
                             lo_masks=sc_masks[li])
            swc.append(sc_pen)
            nhur.append(nh)
            hc.append(x * nh)

        # ---- selection scan (sequential arg-max replay) ----
        best_h = jnp.full(shape, -jnp.inf, jnp.float32)
        best_lh = jnp.full(shape, -(2.0**31), jnp.float32)
        best_li = zero
        for li in range(NL):
            lane = li - k
            sig = (
                match_sig * hlen_n[li].astype(jnp.float32)
                + mismatch_sig * nhur[li].astype(jnp.float32)
                + indel_sig * nsw_n[li].astype(jnp.float32)
            )
            cur_cost = -(swc[li] + hc[li])
            fsc = slp(lane, dest_lane) if is_global else zero
            h_reach = (
                cur_cost - fsc - x * (dest[li] - sp_n[li] - hlen_n[li])
            ).astype(jnp.float32)
            h = jnp.where(reaching, h_reach, sig)
            lh = (-swc[li] - jnp.where(reaching, fsc, 0)).astype(jnp.float32)
            better = (h > best_h) | ((h == best_h) & (lh > best_lh))
            best_h = jnp.where(better, h, best_h)
            best_lh = jnp.where(better, lh, best_lh)
            best_li = jnp.where(better, li, best_li)

        def pick(vals):
            out = vals[0]
            for li in range(1, NL):
                out = jnp.where(best_li == li, vals[li], out)
            return out

        best_len = pick(hlen_n)
        valid = best_len > 0

        # ---- _choose_best_highway ----
        best_lane_v = best_li - k
        sp_b = pick(sp_n)
        swc_b = pick(swc)
        hc_b = pick(hc)
        row_b = []
        for w in range(W):
            rw = orig[0][w]
            for li in range(1, NL):
                rw = jnp.where(best_li == li, orig[li][w], rw)
            row_b.append(rw)

        stc = swc_b + hc_b
        sic = stc
        bil = best_li
        hi_b = [~mask_ge(sp_b, w) for w in range(W)]  # shared mask_lt(sp_b)
        for li in range(NL):
            lane = li - k
            fwd_lb = sfc(lane, best_lane_v)
            skip = (best_li == li) | (sp_n[li] + fwd_lb > sp_b)
            ep = sp_n[li] + hlen_n[li]
            # NOTE raw popcount (no x) — hurdle_matrix.h:389; its window
            # [start_col, ep) is EXACTLY nhur's window above, so reuse it
            ic = swc[li] + nhur[li]
            lo = fwd_lb + ep
            cross = jnp.zeros(shape, jnp.int32)
            for w in range(W):
                msk = mask_ge(lo, w) & hi_b[w]
                cross = cross + jax.lax.population_count(
                    row_b[w] & msk
                ).astype(jnp.int32)
            tc = ic + slp(lane, best_lane_v) + jnp.maximum(0, x * cross)
            upd = ~skip & (tc <= stc) & (ic <= sic)
            stc = jnp.where(upd, tc, stc)
            sic = jnp.where(upd, ic, sic)
            bil = jnp.where(upd, li, bil)

        def pick2(vals):
            out = vals[0]
            for li in range(1, NL):
                out = jnp.where(bil == li, vals[li], out)
            return out

        bl_lane = bil - k
        sp_c = pick2(sp_n)
        len_c = pick2(hlen_n)
        swc_c = pick2(swc)
        hc_c = pick2(hc)
        move = valid if first else act & valid

        cost = cost + jnp.where(move, swc_c + hc_c, 0)
        if first:
            # cur_col = 0 and sfc(0, bl_lane) = 0
            distance = sp_c + len_c
            dl = bl_lane
        else:
            distance = sp_c + len_c - (cur_col + sfc(cur_lane, bl_lane))
            dl = bl_lane - cur_lane

        # step record: bit 0 = final-leap flag (0 here), bits 1-7 the lane
        # delta biased +64 (nonzero for every move record since |dl| <=
        # 2k <= 62), bits 8+ the match advance
        packed = jnp.where(move, ((dl + 64) << 1) | (distance << 8), 0)
        rec_ref[pl.ds(it, 1)] = packed.astype(rec_dt)[None]

        new_lane = jnp.where(move, bl_lane, cur_lane)
        new_col = jnp.where(move, sp_c + len_c, cur_col)
        dest_new = zero
        for li in range(NL):
            dest_new = jnp.where(new_lane + k == li, dest[li], dest_new)
        if first:
            done = ~valid | (move & (new_col >= dest_new))
        else:
            done = done | (act & ~valid) | (move & (new_col >= dest_new))

        st_ref[0] = new_lane
        st_ref[1] = new_col
        st_ref[2] = cost
        st_ref[3] = done.astype(jnp.int32)
        st_ref[4] = steps + move.astype(jnp.int32)
        for li in range(NL):
            lane_ref[li] = sp_n[li]
            lane_ref[NL + li] = hlen_n[li]
            lane_ref[2 * NL + li] = nsw_n[li]
        return it + 1

    def body(it):
        return step(it, False)

    if T >= 1:
        # peeled iteration 0: the unpeeled loop ALWAYS ran it (done is
        # all-false at init so cond(0) holds whenever T >= 1), and it
        # leaves the scratch refs exactly as step(0, False) would
        step(0, True)
        it = jax.lax.while_loop(cond, body, jnp.int32(1))
    else:
        # T == 0: no greedy steps at all; the post-loop reads still need
        # initialized state
        st_ref[0] = zero
        st_ref[1] = zero
        st_ref[2] = zero
        st_ref[3] = zero
        st_ref[4] = zero
        it = jnp.int32(0)
    cur_lane = st_ref[0]
    cur_col = st_ref[1]
    cost = st_ref[2]
    steps = st_ref[4]

    # ---- final leap (run(), hurdle_matrix.h:574-590) ----
    dl_c = jnp.clip(dest_lane, -k, k)
    dest_col = zero
    row_dl = [jnp.zeros(shape, jnp.uint32) for _ in range(W)]
    for li in range(NL):
        sel = dl_c + k == li
        dest_col = jnp.where(sel, dest[li], dest_col)
        for w in range(W):
            row_dl[w] = jnp.where(sel, orig[li][w], row_dl[w])
    lo = cur_col + sfc(cur_lane, dest_lane)
    distance = count_range(row_dl, lo, dest_col)
    distance = jnp.where(in_band, distance, 0)
    # logical form (a bool-valued where trips Mosaic's i8->i1 truncation)
    moved_off = cur_lane != dest_lane
    needs = (in_band & (moved_off | (cur_col < dest_col))) | (
        ~in_band & moved_off
    )
    sc_pen = slp(cur_lane, dest_lane) if is_global else zero
    cost = cost + jnp.where(needs, sc_pen + jnp.maximum(0, x * distance), 0)

    # final-leap record: flag bit set; its lane delta spans +-(L+k) (out-
    # of-band destinations) and is NOT stored — the expansion reconstructs
    # it as dest_lane - sum(in-loop deltas)
    packed = jnp.where(
        needs, 1 | (jnp.where(distance > 0, distance, 0) << 8), 0
    )
    rec_ref[pl.ds(it, 1)] = packed.astype(rec_dt)[None]

    cost_ref[...] = cost
    steps_ref[...] = steps


def stage_swar_t(codes) -> "np.ndarray":
    """Host-side corpus staging: int8 codes [B, L] -> position-major SWAR
    words uint32[L//4, B] (byte j of word w = code of position 4w+j, the
    little-endian order `jax.lax.bitcast_convert_type` defines).

    This is the layout `greedy_align_pallas(..., pre_staged=True)`
    consumes directly. Staging belongs with corpus construction (untimed
    I/O, like the reference laying out its parsed strings,
    benchmark_utils.h:373): XLA's device transpose of [B, L/4] runs ~25x
    below HBM speed and would dominate the whole alignment pipeline,
    while the one-time host transpose here is amortized over every run
    of the corpus. All per-pair *compute* (bit-plane packing, hurdle
    build, the greedy walk) stays in the timed kernel either way.
    """
    import numpy as np

    arr = np.ascontiguousarray(np.asarray(codes, dtype=np.int8))
    B, L = arr.shape
    assert L % 4 == 0
    sw = arr.view(np.uint32)  # [B, L/4], little-endian byte order
    # native path: parallel tiled transpose into a hugepage-prefaulted
    # buffer — numpy's `ascontiguousarray(sw.T)` page-faults a fresh
    # ~1 GB buffer at ~16 MB/s on this VM class (minutes per corpus)
    from asm_tpu.native import load_native

    lib = load_native()
    if lib is not None:
        from asm_tpu.utils.hostmem import host_array

        out = host_array((L // 4, B), np.uint32)
        lib.asm_stage_swar_t(sw, B, L // 4, out, 0)
        return out
    return np.ascontiguousarray(sw.T)  # [L/4, B]


def stage_planes_t(codes, perm=None) -> "np.ndarray":
    """Host-side corpus staging: int8 codes [B, L] -> position-major 2-bit
    planes uint32[L//16, B]. Row w (w < W = L/32) holds plane0 (code
    bit 0), row W+w holds plane1 (code bit 1); bit p of a plane word =
    that code bit of position 32w+p — exactly what the in-kernel `pack2`
    produces, so `greedy_align_pallas(..., pre_staged="planes")` consumes
    these rows directly and skips the per-tile pack entirely.

    4x denser than `stage_swar_t` (2 bits per position instead of a
    byte): quarters the host->device upload and the kernel's HBM input
    reads. Pad codes (4/5) lose their distinguishing high bits here,
    which is fine by construction — the kernels mask validity closed-form
    from the lengths (inv_r/inv_f), never from sentinel codes.

    perm (optional int64[B]): output pair i is packed from input row
    perm[i] — fuses a batch permutation (the difficulty sort) into
    staging so the multi-GB permuted raw-corpus copy never exists.
    """
    import numpy as np

    arr = np.ascontiguousarray(np.asarray(codes, dtype=np.int8))
    B, L = arr.shape
    assert L % 32 == 0
    W = L // 32
    sw = arr.view(np.uint32)  # [B, L/4], little-endian byte order
    if perm is not None:
        perm = np.ascontiguousarray(np.asarray(perm, dtype=np.int64))
        assert perm.shape == (B,)
    from asm_tpu.native import load_native

    lib = load_native()
    if lib is not None:
        import ctypes

        from asm_tpu.utils.hostmem import host_array

        out = host_array((2 * W, B), np.uint32)
        pp = (ctypes.c_void_p(perm.ctypes.data) if perm is not None
              else ctypes.c_void_p(None))
        lib.asm_stage_planes_t(sw, pp, B, W, out, 0)
        return out
    if perm is not None:
        sw = sw[perm]
    # numpy fallback: same carry-free multiply compaction, vectorized
    # over the batch (uint32 wrap-around multiply matches the C path)
    out = np.empty((2 * W, B), np.uint32)
    M1 = np.uint32(0x01010101)
    MM = np.uint32(0x01020408)
    with np.errstate(over="ignore"):
        for w in range(W):
            a0 = np.zeros(B, np.uint32)
            a1 = np.zeros(B, np.uint32)
            for jj in range(8):
                v = sw[:, 8 * w + jj]
                a0 |= (((v & M1) * MM) >> np.uint32(24)) << np.uint32(4 * jj)
                a1 |= ((((v >> np.uint32(1)) & M1) * MM) >> np.uint32(24)) \
                    << np.uint32(4 * jj)
            out[w] = a0
            out[W + w] = a1
    return out


def stage_planes_tiled_t(codes, perm=None, tile: int | None = None
                         ) -> "np.ndarray":
    """Tile-major variant of stage_planes_t: uint32[NBT, L//16, tile]
    (NBT = ceil(B/tile), zero-padded tail tile; tile defaults to the
    module _TILE) — each kernel grid step's whole plane block is one
    contiguous range, which streams ~5x faster than the position-major
    layout's 2W strided rows per block (measured on the v5e). Consumed
    by pre_staged="planes_tiled". Stage at the GRID tile the kernel
    will actually run: a grid tile smaller than the staged block reads
    strided sub-slices (~30% slower on full chunks) — high-energy
    CIGAR passes should restage at leap_cigar_tile's choice."""
    import numpy as np

    _T = _TILE if tile is None else tile
    assert _T % 128 == 0
    arr = np.ascontiguousarray(np.asarray(codes, dtype=np.int8))
    B, L = arr.shape
    assert L % 32 == 0
    W = L // 32
    NBT = -(-B // _T)
    sw = arr.view(np.uint32)
    if perm is not None:
        perm = np.ascontiguousarray(np.asarray(perm, dtype=np.int64))
        assert perm.shape == (B,)
    from asm_tpu.native import load_native

    lib = load_native()
    if lib is not None:
        import ctypes

        from asm_tpu.utils.hostmem import host_array

        out = host_array((NBT, 2 * W, _T), np.uint32)  # mmap zeros
        pp = (ctypes.c_void_p(perm.ctypes.data) if perm is not None
              else ctypes.c_void_p(None))
        lib.asm_stage_planes_tiled_t(sw, pp, B, W, _T, out, 0)
        return out
    flat = stage_planes_t(codes, perm=perm)  # [2W, B]
    out = np.zeros((NBT, 2 * W, _T), np.uint32)
    full = flat.reshape(2 * W, -1)
    nfull = B // _T
    out[:nfull] = full[:, :nfull * _T].reshape(
        2 * W, nfull, _T).transpose(1, 0, 2)
    if B % _T:
        out[nfull, :, :B - nfull * _T] = full[:, nfull * _T:]
    return out


def stage_lanes_t(read_codes, read_len, ref_codes, ref_len, k: int,
                  perm=None) -> "np.ndarray":
    """Host-side corpus staging for `pre_staged="lanes"`: the fully built
    greedy hurdle rows, position-major uint32[(2k+1) * W, B] — row
    (lane+k)*W + w holds word w of lane `lane`'s row, bit-identical to
    what the kernel's in-VMEM build (planes -> funnel -> XOR/OR ->
    validity) produces. The kernel then only computes the denoised copy,
    cutting ~40% of its fixed per-tile build ops in exchange for
    (2k+1)*W*4 bytes/pair of streamed HBM input (112 B at k=3, L=128).
    Staging is corpus prep (untimed), like stage_planes_t.

    perm (optional int64[B]) fuses a batch permutation into staging.
    """
    import numpy as np

    arr = np.ascontiguousarray(np.asarray(read_codes, dtype=np.int8))
    farr = np.ascontiguousarray(np.asarray(ref_codes, dtype=np.int8))
    B, L = arr.shape
    assert L % 32 == 0
    W = L // 32
    NL = 2 * k + 1
    rl = np.ascontiguousarray(np.asarray(read_len, dtype=np.int32))
    fl = np.ascontiguousarray(np.asarray(ref_len, dtype=np.int32))
    rsw = arr.view(np.uint32)
    fsw = farr.view(np.uint32)
    if perm is not None:
        perm = np.ascontiguousarray(np.asarray(perm, dtype=np.int64))
        assert perm.shape == (B,)
    from asm_tpu.native import load_native

    lib = load_native()
    if lib is not None:
        import ctypes

        from asm_tpu.utils.hostmem import host_array

        out = host_array((NL * W, B), np.uint32)
        pp = (ctypes.c_void_p(perm.ctypes.data) if perm is not None
              else ctypes.c_void_p(None))
        lib.asm_stage_lanes_t(rsw, fsw, rl, fl, pp, B, W, k, out, 0)
        return out
    # numpy fallback: same math, vectorized over the batch
    if perm is not None:
        arr, farr = arr[perm], farr[perm]
        rl, fl = rl[perm], fl[perm]
    p0 = np.zeros((W, B), np.uint32)
    p1 = np.zeros((W, B), np.uint32)
    q0 = np.zeros((W, B), np.uint32)
    q1 = np.zeros((W, B), np.uint32)
    bits_r = arr.T.astype(np.uint32)  # [L, B]
    bits_f = farr.T.astype(np.uint32)
    for w in range(W):
        for b in range(32):
            p0[w] |= (bits_r[32 * w + b] & 1) << np.uint32(b)
            p1[w] |= ((bits_r[32 * w + b] >> 1) & 1) << np.uint32(b)
            q0[w] |= (bits_f[32 * w + b] & 1) << np.uint32(b)
            q1[w] |= ((bits_f[32 * w + b] >> 1) & 1) << np.uint32(b)

    def mask_ge(c, w):  # c: [B]
        low = np.clip(c - 32 * w, 0, 32)
        msk = np.uint32(0xFFFFFFFF) << np.minimum(low, 31).astype(np.uint32)
        return np.where(low >= 32, np.uint32(0), msk).astype(np.uint32)

    def fun(p, s, w):
        if s == 0:
            return p[w]
        hi = p[w + 1] if w + 1 < W else np.zeros(B, np.uint32)
        return (p[w] >> np.uint32(s)) | (hi << np.uint32(32 - s))

    m = np.minimum(rl, L).astype(np.int64)
    n = np.minimum(fl, L).astype(np.int64)
    out = np.zeros((NL * W, B), np.uint32)
    for li in range(NL):
        lane = li - k
        a_off, b_off = max(-lane, 0), max(lane, 0)
        for w in range(W):
            out[li * W + w] = (
                (fun(p0, a_off, w) ^ fun(q0, b_off, w))
                | (fun(p1, a_off, w) ^ fun(q1, b_off, w))
                | mask_ge(m - a_off, w) | mask_ge(n - b_off, w)
            )
    return out


@functools.partial(
    jax.jit, static_argnames=("cfg", "interpret", "want_cigar", "pre_staged")
)
def greedy_align_pallas(read_codes, read_len, ref_codes, ref_len,
                        cfg: AlignConfig, interpret: bool = False,
                        want_cigar: bool = True, pre_staged: bool = False):
    """Drop-in replacement for greedy_align with identical outputs
    (cost / cigar_ops / cigar_runs / cigar_count / steps).

    Pads the batch to a multiple of _TILE internally.

    want_cigar=False skips the XLA-side expansion of the packed step
    records into (op, run) slot buffers and returns only cost / steps /
    the raw packed records (`step_rec` int16[T+1, B], int32 for long
    sequences / wide bands — see _rec_dtype) — the kernel always
    emits the full RLE record stream (like the reference always appends
    its CIGAR string), but expanding it to slot buffers costs more HBM
    traffic than the alignment itself at large batches.

    pre_staged=True (or "swar"): read_codes/ref_codes are already
    position-major SWAR words uint32[L//4, B] from `stage_swar_t`.
    pre_staged="planes": position-major 2-bit planes uint32[L//16, B]
    from `stage_planes_t` — 4x denser, and the kernel skips the per-tile
    pack (the production corpus layout). The default [B, L] int8 path
    bitcasts + transposes on device for API compatibility, but that XLA
    transpose costs more than the alignment itself at large B —
    production pipelines stage once on the host and pass a staged form.
    """
    L = cfg.max_len
    T = cfg.steps_bound
    assert L % 32 == 0
    if pre_staged in ("lanes", "planes_tiled"):
        planes = {"lanes": "lanes", "planes_tiled": "tiled"}[pre_staged]
    else:
        planes = pre_staged == "planes"

    if pre_staged == "planes_tiled":
        NBT, rows2, TL_ = read_codes.shape
        assert rows2 == L // 16 and TL_ == _TILE
        assert ref_codes.shape == (NBT, rows2, _TILE)
        assert read_codes.dtype == jnp.uint32
        B = read_len.shape[0]
        BP = NBT * _TILE
        assert B <= BP and BP - B < _TILE
        if BP > B:
            zero_l = jnp.zeros((BP - B,), jnp.int32)
            read_len = jnp.concatenate([read_len.astype(jnp.int32), zero_l])
            ref_len = jnp.concatenate([ref_len.astype(jnp.int32), zero_l])
        NB = BP // 128
        rc_t = read_codes.reshape(NBT, rows2, _SUB, 128)
        fc_t = ref_codes.reshape(NBT, rows2, _SUB, 128)
    elif pre_staged:
        Wq, B = read_codes.shape
        if pre_staged == "lanes":
            NLW = cfg.num_lanes * (L // 32)
            H = (NLW + 1) // 2
            assert Wq == H and ref_codes.shape[0] == NLW - H, (
                "pre_staged='lanes' takes stage_lanes_t rows split as "
                "[:H] / [H:]"
            )
        else:
            assert Wq == (L // 16 if planes else L // 4)
        assert read_codes.dtype == jnp.uint32
        pad = (-B) % _TILE
        BP = B + pad
        if pad:
            zero_l = jnp.zeros((pad,), jnp.int32)
            read_codes = jnp.concatenate(
                [read_codes, jnp.zeros((read_codes.shape[0], pad),
                                       jnp.uint32)], axis=1)
            ref_codes = jnp.concatenate(
                [ref_codes, jnp.zeros((ref_codes.shape[0], pad),
                                      jnp.uint32)], axis=1)
            read_len = jnp.concatenate([read_len.astype(jnp.int32), zero_l])
            ref_len = jnp.concatenate([ref_len.astype(jnp.int32), zero_l])
        NB = BP // 128
        rc_t = read_codes.reshape(read_codes.shape[0], NB, 128)
        fc_t = ref_codes.reshape(ref_codes.shape[0], NB, 128)
    else:
        B, Lc = read_codes.shape
        assert Lc == L
        pad = (-B) % _TILE
        BP = B + pad
        if pad:
            zero_c = jnp.zeros((pad, L), read_codes.dtype)
            zero_l = jnp.zeros((pad,), jnp.int32)
            read_codes = jnp.concatenate([read_codes, zero_c])
            ref_codes = jnp.concatenate([ref_codes, zero_c])
            read_len = jnp.concatenate([read_len.astype(jnp.int32), zero_l])
            ref_len = jnp.concatenate([ref_len.astype(jnp.int32), zero_l])

        NB = BP // 128
        # position-major SWAR code words [L/4, NB, 128] uint32 (byte j =
        # code of position 4w+j; the in-kernel pack compacts them into
        # bit-planes once per tile — see module docstring). Bitcasting 4
        # int8 codes per word keeps the transposed copies at 1 byte per
        # position so multi-million-pair chunks fit in HBM.
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

    if planes == "tiled":
        code_specs = [
            pl.BlockSpec((1, L // 16, _SUB, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        ] * 2
    else:
        if planes == "lanes":
            rows_r, rows_f = rc_t.shape[0], fc_t.shape[0]
        else:
            rows_r = rows_f = L // 16 if planes else L // 4
        code_specs = [
            pl.BlockSpec((rows_r, _SUB, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_f, _SUB, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ]
    grid = (NB // _SUB,)
    kernel = functools.partial(_greedy_kernel, cfg, planes)
    cost, steps, rec = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            *code_specs,
            pl.BlockSpec((_SUB, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SUB, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_SUB, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SUB, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T + 1, _SUB, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NB, 128), jnp.int32),
            jax.ShapeDtypeStruct((NB, 128), jnp.int32),
            jax.ShapeDtypeStruct((T + 1, NB, 128), _rec_dtype(cfg)),
        ],
        scratch_shapes=[
            pltpu.VMEM((5, _SUB, 128), jnp.int32),            # st_ref
            pltpu.VMEM((3 * cfg.num_lanes, _SUB, 128), jnp.int32),  # lane_ref
        ],
        interpret=interpret,
    )(rc_t, fc_t, rl_t, fl_t)

    cost = cost.reshape(BP)[:B]
    steps = steps.reshape(BP)[:B]
    rec = rec.reshape(T + 1, BP)[:, :B]  # [T+1, B]

    if not want_cigar:
        return dict(cost=cost, steps=steps, step_rec=rec)

    # ---- expand packed records to (op, run) slot buffers (as greedy.py) --
    r = rec.astype(jnp.int32)
    if _rec_dtype(cfg) == jnp.int16:
        r = r & 0xFFFF  # undo the int16 sign extension, keep raw bits
    is_final = (r & 1) != 0
    sdist = r >> 8
    sdl = jnp.where(is_final, 0, ((r >> 1) & 0x7F) - 64)
    sdl = jnp.where(r != 0, sdl, 0)
    # the final leap's lane delta is reconstructed, not stored (it spans
    # +-(L+k)): dest_lane minus everything the in-loop records moved
    m = jnp.minimum(read_len.astype(jnp.int32), L)[:B]
    n = jnp.minimum(ref_len.astype(jnp.int32), L)[:B]
    dl_final = (n - m) - jnp.sum(sdl, axis=0)
    sdl = jnp.where(is_final, dl_final[None, :], sdl)
    sdl_t = sdl.T  # [B, T+1]
    sdist_t = sdist.T
    ops_even = jnp.where(sdl_t < 0, OP_I, OP_D).astype(jnp.int8)
    runs_even = jnp.abs(sdl_t)
    ops_odd = jnp.full((B, T + 1), OP_M, jnp.int8)
    runs_odd = sdist_t
    ops_ = jnp.stack([ops_even, ops_odd], axis=2).reshape(B, 2 * (T + 1))
    runs_ = jnp.stack([runs_even, runs_odd], axis=2).reshape(B, 2 * (T + 1))

    return dict(
        cost=cost,
        cigar_ops=ops_,
        cigar_runs=runs_,
        cigar_count=jnp.sum(runs_ > 0, axis=1, dtype=jnp.int32),
        steps=steps,
    )
