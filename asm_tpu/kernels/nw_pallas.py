"""Fused Pallas TPU kernels for the NW/Gotoh wavefront.

Same recurrence and conventions as asm_tpu.kernels.nw (which remains the
conformance anchor). The XLA scan streams four [B, 128] carry arrays
through HBM on every one of the 2L diagonal steps — ~0.5 GB/step at
B=131k; these kernels keep the whole wavefront state in VMEM for a
_TB-pair tile and only touch HBM for codes in / results out.

Layout: positions across lanes (cells i in [1, L] at lane q = i-1, exactly
the XLA kernel's scheme incl. the virtual i == 0 border), _TB pairs across
sublanes per grid step. The reversed-ref diagonal window is maintained
incrementally as ONE [_TB, 2L] circular buffer rolled one lane per
diagonal: the window V read by step d occupies lanes [L, 2L); the value a
circular roll wraps into lane 0 at step d is pad[3L - d] — sentinel for
every d <= L, and a lane-0 value entering at step d is only ever read
into V at step d + L > 2L for d > L, so no boundary patch is needed
anywhere (proof in _init_window's comment). Three per-step funnel shifts
collapse into one roll.

Further op-count trims over the naive schedule:
  * the shifted h/e rows that feed e_open / sub / e_ext are computed once
    per step and PIPELINED through scratch rows (sub at step d reuses the
    shift produced for e_open at step d-1), so each step performs exactly
    one h-shift and one e-shift;
  * the diagonal loop runs to D0 = max(m + n) over the tile (a traced
    bound — lax lowers it to a while loop with zero per-iteration
    overhead), not the worst-case 2L; at the benchmark's ~100-char pairs
    in 128 lanes that is ~20% fewer steps.

Two kernels:
  * `_nw_kernel` — penalty only (`nw_penalty_pallas`).
  * `_nw_trace_kernel` — forward + in-VMEM traceback
    (`nw_align_pallas`): the forward pass additionally parks one packed
    pointer byte per cell per diagonal in an int8 VMEM stack
    ([2L, _TB, L] = 4 MiB/tile), then a second in-kernel loop replays
    the diagonals in reverse exactly like nw.nw_align's reverse scan —
    per-pair cursors live in [_TB, 1] registers, the pointer-byte fetch
    is a one-hot masked lane reduce, and the per-step op is committed to
    a [_TB, 2L] accumulator with a one-hot column mask (Mosaic-friendly:
    no dynamic lane stores anywhere). The optional `match_mask` output
    ('='-runs >= threshold over READ positions, the coverage metric's
    input — benchmark_coverage.h:26-67) is maintained in the same loop.
    This replaces the round-1 arrangement where traceback/coverage had
    to fall back to the HBM-streaming XLA path (the reference's headline
    benchmark runs parasail *trace* per pair, benchmark_utils.h:130-150).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from asm_tpu.kernels.nw import OP_NONE, OP_EQ, OP_X, OP_I, OP_D

INF = 1 << 29
_TB = 128  # pairs per tile


def _h_top(dd, o, e):
    """Virtual top-border penalty H[0][j] at diagonal offset dd = j."""
    return jnp.where(dd <= 0, jnp.where(dd == 0, 0, INF), o + (dd - 1) * e)


def _window_start(rev):
    """d=1 state of the [B, 2L] circular reverse-ref window (host/XLA side).

    Invariant maintained by the kernels: before step d,
    win[q] = pad[L + q + 1 - d] for pad = [sent(L), rev(L), sent(L+1)], so
    the window V read by step d is win[L:2L] (V_d[q] = pad[(2L+1-d)+q],
    the value compared against cell i = q+1 on diagonal d). A step reads
    V, then rolls win by +1 lane. The roll wraps win[2L-1] = pad[3L-d]
    into lane 0, where the invariant wants pad[L-d]: both are sentinels
    for d <= L (indices in the pad's sentinel blocks), and for d > L the
    wrapped value is only ever read into V at step d + L > 2L, i.e.
    never — so the plain circular roll maintains the invariant with no
    boundary patch. win_1[q] = pad[L + q]: [rev | sentinel].
    """
    L = rev.shape[1]
    return jnp.concatenate(
        [rev, jnp.full((rev.shape[0], L), -2, jnp.int32)], axis=1
    )


def _nw_kernel(L, x, o, e, rc_ref, w_ref, rl_ref, fl_ref, pen_ref, st_ref,
               win_ref):
    shape = (_TB, L)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    ii = lane + 1  # cell index i at lane q

    m = jnp.minimum(rl_ref[...], L)
    n = jnp.minimum(fl_ref[...], L)
    mn = m + n
    d_max = jnp.max(mn)  # traced trip count: tile's farthest diagonal

    aa = rc_ref[...]  # cell i uses read[i-1] = lane q

    # st_ref rows: 0 h1 (unshifted), 1 SA = shift(h_{d-1}), 2 SB =
    # shift(h_{d-2}), 3 se1 = shift(e_{d-1}), 4 f1 (unshifted), 5 pen
    inf_row = jnp.full(shape, INF, jnp.int32)
    st_ref[0] = inf_row
    # SA for d=1: shift(h_0 = INF row) with lane-0 fill h_top(0) = 0
    st_ref[1] = jnp.where(lane == 0, 0, INF)
    st_ref[2] = inf_row
    st_ref[3] = inf_row
    st_ref[4] = inf_row
    # m == 0 pairs end on the virtual top border: closed form
    st_ref[5] = jnp.broadcast_to(
        jnp.where(mn == 0, 0, jnp.where(m == 0, o + (mn - 1) * e, INF)),
        shape,
    )
    win_ref[...] = w_ref[...]  # pre-built by _window_start

    def shift_fill(arr, fill):
        """value at lane q-1; lane 0 reads the (scalar) fill."""
        r = pltpu.roll(arr, 1, axis=1)
        return jnp.where(lane == 0, fill, r)

    def body(d, _):
        h1 = st_ref[0]
        sa = st_ref[1]
        sb = st_ref[2]
        se1 = st_ref[3]
        f1 = st_ref[4]

        win = win_ref[...]
        bb = win[:, L:]  # V_d
        win_ref[...] = pltpu.roll(win, 1, axis=1)

        e_new = jnp.minimum(sa + o, se1 + e)
        f_new = jnp.minimum(h1 + o, f1 + e)

        mis = (aa != bb).astype(jnp.int32)
        sub = sb + x * mis

        h_new = jnp.minimum(sub, jnp.minimum(e_new, f_new))

        border_pen = o + (d - 1) * e
        at_left = ii == d
        h_new = jnp.where(at_left, border_pen, h_new)
        e_new = jnp.where(at_left, border_pen, e_new)
        f_new = jnp.where(at_left, INF, f_new)

        pen = st_ref[5]
        st_ref[5] = jnp.where(
            (d == mn) & (ii == m) & (m > 0), h_new, pen
        )

        st_ref[0] = h_new
        st_ref[2] = sa  # SB' = shift(h_{d-1}) w/ fill h_top(d-1)
        st_ref[1] = shift_fill(h_new, _h_top(d, o, e))
        st_ref[3] = shift_fill(e_new, INF)
        st_ref[4] = f_new
        return 0

    jax.lax.fori_loop(1, d_max + 1, body, 0)

    # pen holds the result at lane m-1 for each pair (single set lane);
    # fold over lanes with the "only one lane differs from the masked
    # default" trick: take min over lanes of (pen where set else INF),
    # then the m == 0 closed form stored as a full row wins via min too.
    pen = st_ref[5]
    picked = jnp.min(
        jnp.where((ii == jnp.maximum(m, 1)) | (m == 0), pen, INF), axis=1
    )
    pen_ref[...] = picked[:, None]


@functools.partial(jax.jit, static_argnames=("x", "o", "e", "interpret"))
def nw_penalty_pallas(read_codes, read_len, ref_codes, ref_len,
                      x=1, o=1, e=1, interpret: bool = False):
    """Exact global alignment penalty, Pallas wavefront. int32[B]."""
    B, L = read_codes.shape
    pad = (-B) % _TB
    BP = B + pad
    if pad:
        zc = jnp.zeros((pad, L), read_codes.dtype)
        zl = jnp.zeros((pad,), jnp.int32)
        read_codes = jnp.concatenate([read_codes, zc])
        ref_codes = jnp.concatenate([ref_codes, zc])
        read_len = jnp.concatenate([read_len.astype(jnp.int32), zl])
        ref_len = jnp.concatenate([ref_len.astype(jnp.int32), zl])

    kernel = functools.partial(_nw_kernel, L, x, o, e)
    pen = pl.pallas_call(
        kernel,
        grid=(BP // _TB,),
        in_specs=[
            pl.BlockSpec((_TB, L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TB, 2 * L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TB, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TB, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TB, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BP, 1), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((6, _TB, L), jnp.int32),
            pltpu.VMEM((_TB, 2 * L), jnp.int32),
        ],
        interpret=interpret,
    )(
        read_codes.astype(jnp.int32),
        _window_start(jnp.flip(ref_codes.astype(jnp.int32), axis=1)),
        read_len.astype(jnp.int32).reshape(BP, 1),
        ref_len.astype(jnp.int32).reshape(BP, 1),
    )
    return pen.reshape(BP)[:B]


def _nw_trace_kernel(L, x, o, e, thr, rc_ref, w_ref, rl_ref, fl_ref,
                     pen_ref, ops_ref, mask_ref, st_ref, win_ref, ptr_ref,
                     acc_ref):
    """Forward wavefront + in-VMEM traceback for one _TB-pair tile.

    Mirrors nw.nw_align / nw._wavefront bit-for-bit (same pointer-byte
    encoding: bits0-1 H-source, bit2 E-open, bit3 F-open, bit4 mismatch).
    thr < 0 disables the match-mask bookkeeping (mask_ref still written,
    with zeros, to keep the output arity static). Same circular-window /
    pipelined-shift / dynamic-trip-count schedule as _nw_kernel.
    """
    shape = (_TB, L)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    ii = lane + 1  # cell index i at lane q

    m = jnp.minimum(rl_ref[...], L)
    n = jnp.minimum(fl_ref[...], L)
    mn = m + n
    d_max = jnp.max(mn)

    aa = rc_ref[...]

    # st_ref rows: 0 h1, 1 SA = shift(h_{d-1}), 2 SB = shift(h_{d-2}),
    # 3 se1 = shift(e_{d-1}), 4 f1, 5 pen
    inf_row = jnp.full(shape, INF, jnp.int32)
    st_ref[0] = inf_row
    st_ref[1] = jnp.where(lane == 0, 0, INF)
    st_ref[2] = inf_row
    st_ref[3] = inf_row
    st_ref[4] = inf_row
    st_ref[5] = jnp.broadcast_to(
        jnp.where(mn == 0, 0, jnp.where(m == 0, o + (mn - 1) * e, INF)),
        shape,
    )
    win_ref[...] = w_ref[...]

    def shift_fill(arr, fill):
        r = pltpu.roll(arr, 1, axis=1)
        return jnp.where(lane == 0, fill, r)

    def fwd(d, _):
        h1 = st_ref[0]
        sa = st_ref[1]
        sb = st_ref[2]
        se1 = st_ref[3]
        f1 = st_ref[4]

        win = win_ref[...]
        bb = win[:, L:]
        win_ref[...] = pltpu.roll(win, 1, axis=1)

        e_open = sa + o
        e_ext = se1 + e
        e_new = jnp.minimum(e_open, e_ext)
        f_open = h1 + o
        f_ext = f1 + e
        f_new = jnp.minimum(f_open, f_ext)

        mis = (aa != bb).astype(jnp.int32)
        sub = sb + x * mis

        h_new = jnp.minimum(sub, jnp.minimum(e_new, f_new))

        border_pen = o + (d - 1) * e
        at_left = ii == d
        h_new = jnp.where(at_left, border_pen, h_new)
        e_new = jnp.where(at_left, border_pen, e_new)
        f_new = jnp.where(at_left, INF, f_new)

        pen = st_ref[5]
        st_ref[5] = jnp.where((d == mn) & (ii == m) & (m > 0), h_new, pen)

        # packed pointer byte (exactly nw.py's encoding; int32 math — bool
        # vectors miscompile in Mosaic)
        ptr_h = jnp.where(
            h_new == sub, 0, jnp.where(h_new == e_new, 1, 2)
        )
        ptr_h = jnp.where(at_left, 1, ptr_h)
        e_is_open = (e_open <= e_ext).astype(jnp.int32)
        e_is_open = jnp.where(at_left, (d == 1).astype(jnp.int32), e_is_open)
        f_is_open = (f_open <= f_ext).astype(jnp.int32)
        ptr = ptr_h | (e_is_open << 2) | (f_is_open << 3) | (mis << 4)
        ptr_ref[d - 1] = ptr.astype(jnp.int8)

        st_ref[0] = h_new
        st_ref[2] = sa
        st_ref[1] = shift_fill(h_new, _h_top(d, o, e))
        st_ref[3] = shift_fill(e_new, INF)
        st_ref[4] = f_new
        return 0

    jax.lax.fori_loop(1, d_max + 1, fwd, 0)

    pen = st_ref[5]
    picked = jnp.min(
        jnp.where((ii == jnp.maximum(m, 1)) | (m == 0), pen, INF), axis=1
    )
    pen_ref[...] = picked[:, None]

    # ---- traceback: replay diagonals d = 2L .. 1 (nw.nw_align's reverse
    # scan). Per-pair cursor state is [_TB, 1]; the only [_TB, L]-wide work
    # per step is the one-hot pointer fetch (+ mask update when thr >= 0)
    # and the [_TB, 2L] one-hot op commit.
    ww = ii  # 1-based read position across lanes
    ww0 = lane  # 0-based
    col2 = jax.lax.broadcasted_iota(jnp.int32, (_TB, 2 * L), 1)

    acc_ref[0] = jnp.zeros((_TB, 2 * L), jnp.int32)  # op codes per step
    # cursor rows live in st_ref's (now free) forward-state rows, packed
    # into lane 0..3 of row 0? — no: keep them as whole [_TB, L] rows for
    # layout simplicity (writes are cheap, reads broadcast from lane 0).
    i_cur = m  # [_TB, 1]
    j_cur = n
    st_cur = jnp.zeros((_TB, 1), jnp.int32)
    run = jnp.zeros((_TB, 1), jnp.int32)
    mask = jnp.zeros(shape, jnp.int32)

    # vector loop state must live in VMEM scratch (Mosaic relayout bug
    # with vector while-carries) — reuse st_ref rows 0-3 as i/j/st/run
    # (broadcast along lanes; lane 0 is authoritative) and row 4 as mask.
    st_ref[0] = jnp.broadcast_to(i_cur, shape)
    st_ref[1] = jnp.broadcast_to(j_cur, shape)
    st_ref[2] = jnp.broadcast_to(st_cur, shape)
    st_ref[3] = jnp.broadcast_to(run, shape)
    st_ref[4] = mask

    want_mask = thr >= 0

    def bwd(t, _):
        d = d_max - t  # diagonals above d_max are inactive for every pair
        i = st_ref[0]  # [_TB, L], constant along lanes
        j = st_ref[1]
        st = st_ref[2]

        ptr_d = ptr_ref[d - 1].astype(jnp.int32)
        active = ((i + j) == d) & ((i > 0) | (j > 0))
        fetched = jnp.sum(
            jnp.where(ww == i, ptr_d, 0), axis=1, keepdims=True
        )
        fetched = jnp.broadcast_to(fetched, shape)
        top_byte = 2 | jnp.where(d == 1, 8, 0)
        byte = jnp.where(i == 0, top_byte, fetched)
        ptr_h = byte & 3
        e_open = (byte >> 2) & 1
        f_open = (byte >> 3) & 1
        mis = (byte >> 4) & 1

        go_diag = ((st == 0) & (ptr_h == 0)).astype(jnp.int32)
        go_e = (((st == 0) & (ptr_h == 1)) | (st == 1)).astype(jnp.int32)
        go_f = (((st == 0) & (ptr_h == 2)) | (st == 2)).astype(jnp.int32)

        op = jnp.where(
            go_diag == 1,
            jnp.where(mis == 1, OP_X, OP_EQ),
            jnp.where(go_e == 1, OP_I, OP_D),
        )
        op = jnp.where(active, op, OP_NONE)

        # commit this step's op to accumulator column 2L - d — the column
        # the full-2L replay would use, so the ops layout stays bit-equal
        # to nw.nw_align regardless of d_max (one-hot; op is
        # lane-constant so lane 0's value is the one committed)
        op0 = jnp.sum(
            jnp.where(lane == 0, op, 0), axis=1, keepdims=True
        )
        acc_ref[0] = acc_ref[0] | jnp.where(col2 == 2 * L - d, op0, 0)

        di = jnp.where((go_diag | go_e) == 1, 1, 0)
        dj = jnp.where((go_diag | go_f) == 1, 1, 0)
        new_st = jnp.where(
            go_diag == 1,
            0,
            jnp.where(
                go_e == 1,
                jnp.where(e_open == 1, 0, 1),
                jnp.where(f_open == 1, 0, 2),
            ),
        )
        if want_mask:
            run_v = st_ref[3]
            mask_v = st_ref[4]
            is_eq = active & (go_diag == 1) & (mis == 0)
            ends = active & ~is_eq
            mark = ((run_v > 0) & ends & (run_v >= thr)).astype(jnp.int32)
            mask_v = mask_v | (
                jnp.where(
                    (mark == 1) & (ww0 >= i) & (ww0 < i + run_v), 1, 0
                )
            )
            st_ref[4] = mask_v
            st_ref[3] = jnp.where(
                is_eq, run_v + 1, jnp.where(ends, 0, run_v)
            )

        st_ref[0] = jnp.where(active, i - di, i)
        st_ref[1] = jnp.where(active, j - dj, j)
        st_ref[2] = jnp.where(active, new_st, st)
        return 0

    jax.lax.fori_loop(0, d_max, bwd, 0)

    ops_ref[...] = acc_ref[0].astype(jnp.int8)
    if want_mask:
        i_f = st_ref[0]
        run_f = st_ref[3]
        mask_f = st_ref[4]
        # flush a run still open at the scan's end (alignment starts with
        # '=' at read position 0)
        mask_f = mask_f | jnp.where(
            (run_f >= thr) & (run_f > 0) & (ww0 >= i_f)
            & (ww0 < i_f + run_f),
            1,
            0,
        )
        mask_ref[...] = mask_f.astype(jnp.int8)
    else:
        mask_ref[...] = jnp.zeros(shape, jnp.int8)


@functools.partial(
    jax.jit,
    static_argnames=("x", "o", "e", "match_mask_threshold", "interpret"),
)
def nw_align_pallas(read_codes, read_len, ref_codes, ref_len,
                    x=1, o=1, e=1, match_mask_threshold: int | None = None,
                    interpret: bool = False):
    """Exact global alignment with traceback, fused Pallas kernel.

    Bit-identical to asm_tpu.kernels.nw.nw_align (pinned by tests):
    returns (penalty int32[B], ops int8[B, 2L]) — OP_* codes in REVERSE
    alignment order, OP_NONE-padded — plus bool[B, L] read-position match
    mask when `match_mask_threshold` is set (the coverage metric's NW-side
    input, see metrics.coverage_device).
    """
    B, L = read_codes.shape
    pad = (-B) % _TB
    BP = B + pad
    if pad:
        zc = jnp.zeros((pad, L), read_codes.dtype)
        zl = jnp.zeros((pad,), jnp.int32)
        read_codes = jnp.concatenate([read_codes, zc])
        ref_codes = jnp.concatenate([ref_codes, zc])
        read_len = jnp.concatenate([read_len.astype(jnp.int32), zl])
        ref_len = jnp.concatenate([ref_len.astype(jnp.int32), zl])

    thr = -1 if match_mask_threshold is None else int(match_mask_threshold)
    kernel = functools.partial(_nw_trace_kernel, L, x, o, e, thr)
    pen, ops, mask = pl.pallas_call(
        kernel,
        grid=(BP // _TB,),
        in_specs=[
            pl.BlockSpec((_TB, L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TB, 2 * L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TB, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TB, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_TB, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TB, 2 * L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TB, L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BP, 1), jnp.int32),
            jax.ShapeDtypeStruct((BP, 2 * L), jnp.int8),
            jax.ShapeDtypeStruct((BP, L), jnp.int8),
        ],
        scratch_shapes=[
            pltpu.VMEM((6, _TB, L), jnp.int32),
            pltpu.VMEM((_TB, 2 * L), jnp.int32),
            pltpu.VMEM((2 * L, _TB, L), jnp.int8),
            pltpu.VMEM((1, _TB, 2 * L), jnp.int32),
        ],
        interpret=interpret,
    )(
        read_codes.astype(jnp.int32),
        _window_start(jnp.flip(ref_codes.astype(jnp.int32), axis=1)),
        read_len.astype(jnp.int32).reshape(BP, 1),
        ref_len.astype(jnp.int32).reshape(BP, 1),
    )
    pen = pen.reshape(BP)[:B]
    ops = ops[:B]
    if match_mask_threshold is None:
        return pen, ops
    return pen, ops, mask[:B].astype(bool)
