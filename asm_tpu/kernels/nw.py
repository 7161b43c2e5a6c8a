"""Batched exact Needleman-Wunsch/Gotoh affine-gap global alignment.

The accuracy oracle of the framework — the TPU-native replacement for the
reference's parasail dependency (GASMA/benchmark/benchmark_utils.h:104-150).
Penalty convention (pinned by tests against asm_tpu.reference_impl.nw_ref):
mismatch costs x, a gap of length L costs o + (L-1)*e, penalty = minimized
total (== -parasail score with matrix ("ACGT", 0, -x), benchmark_utils.h:288).

TPU design: instead of parasail's striped-SIMD single-pair DP, the batch of
pairs IS the parallel axis. The DP runs as an anti-diagonal wavefront
(jax.lax.scan over 2L diagonals): every cell of one diagonal depends only on
the two previous diagonals, so a whole diagonal of L+1 cells is one fused
VPU pass — vectorized over [B, L+1] with B pairs across sublanes and the
diagonal across lanes. No data-dependent shapes: all pairs run the full
2L-step wavefront and each pair's result is snapshotted at its own final
diagonal d == m+n (a per-step [B] gather, far cheaper than stacking the DP).

Traceback (for CIGAR / the coverage metric) stores one packed pointer byte
per cell per diagonal during the forward scan and then chases pointers for
2L masked steps — each step one flat gather — emitting one op per step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# plain int (not jnp scalar): module import must not initialize the backend
INF = 1 << 29

# traceback op codes (host-side RLE turns these into CIGAR strings)
OP_NONE = 0
OP_EQ = 1  # '='
OP_X = 2  # 'X'
OP_I = 3  # 'I' consumes s1 (read)
OP_D = 4  # 'D' consumes s2 (ref)


def _wavefront(read_codes, ref_codes, read_len, ref_len, x, o, e, want_trace):
    """Shared forward pass. Returns (penalty[B], ptr_stack or None).

    Coordinates: cell (i, j) aligns read[:i] with ref[:j]; diagonal d = i+j,
    cells indexed by i in [0, L]. State H/E/F as in Gotoh: E = gap consuming
    the read ('I'), F = gap consuming the ref ('D').
    """
    B, L = read_codes.shape
    W = L + 1
    ii = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)  # i along the diagonal

    # read char used by cell i: read[i-1] (sentinel at i=0)
    aa = jnp.concatenate(
        [jnp.full((B, 1), -1, dtype=jnp.int8), read_codes], axis=1
    ).astype(jnp.int8)
    # reversed ref padded on both sides so cell i of diag d reads
    # ref[d-i-1] = b_rev_pad[(L - d + W) + i]  (dynamic slice per diagonal)
    b_rev = jnp.flip(ref_codes, axis=1)
    b_rev_pad = jnp.concatenate(
        [
            jnp.full((B, W), -2, dtype=jnp.int8),
            b_rev,
            jnp.full((B, W), -2, dtype=jnp.int8),
        ],
        axis=1,
    )

    mn = read_len + ref_len  # final diagonal per pair

    h0 = jnp.where(ii == 0, 0, INF)  # diagonal 0: only (0,0) valid
    e0 = jnp.full((B, W), INF, dtype=jnp.int32)
    f0 = jnp.full((B, W), INF, dtype=jnp.int32)
    pen0 = jnp.where(mn == 0, 0, INF)

    def shift_i(arr, fill):
        """value at index i-1 along the diagonal axis."""
        return jnp.concatenate(
            [jnp.full((B, 1), fill, dtype=arr.dtype), arr[:, :-1]], axis=1
        )

    def step(carry, d):
        h1, h2, e1, f1, pen = carry
        # gap-state recurrences (open preferred on ties, matching nw_ref)
        e_open = shift_i(h1, INF) + o
        e_ext = shift_i(e1, INF) + e
        e_new = jnp.minimum(e_open, e_ext)
        f_open = h1 + o
        f_ext = f1 + e
        f_new = jnp.minimum(f_open, f_ext)

        # substitution from diagonal d-2
        bb = jax.lax.dynamic_slice_in_dim(b_rev_pad, L - d + W, W, axis=1)
        mis = (aa != bb).astype(jnp.int32)
        sub = shift_i(h2, INF) + x * mis

        h_new = jnp.minimum(sub, jnp.minimum(e_new, f_new))

        # boundary cells of this diagonal: i == 0 (j = d) and i == d (j = 0)
        border_pen = o + (d - 1) * e
        at_top = ii == 0
        at_left = ii == d
        h_new = jnp.where(at_top | at_left, border_pen, h_new)
        e_new = jnp.where(at_top, INF, jnp.where(at_left, border_pen, e_new))
        f_new = jnp.where(at_left, INF, jnp.where(at_top, border_pen, f_new))
        # cells beyond the valid triangle (i > d) are never read; leave as-is

        # snapshot the final cell for pairs whose alignment ends on diagonal d
        val = jnp.take_along_axis(h_new, read_len[:, None], axis=1)[:, 0]
        pen = jnp.where(d == mn, val, pen)

        if want_trace:
            # packed pointer byte: bits0-1 H-source (0 diag, 1 E, 2 F),
            # bit2 E-open, bit3 F-open, bit4 mismatch
            ptr_h = jnp.where(
                h_new == sub,
                0,
                jnp.where(h_new == e_new, 1, 2),
            )
            ptr_h = jnp.where(at_top, 2, jnp.where(at_left, 1, ptr_h))
            e_is_open = e_open <= e_ext
            e_is_open = jnp.where(at_left, d == 1, e_is_open)
            f_is_open = f_open <= f_ext
            f_is_open = jnp.where(at_top, d == 1, f_is_open)
            ptr = (
                ptr_h.astype(jnp.uint8)
                | (e_is_open.astype(jnp.uint8) << 2)
                | (f_is_open.astype(jnp.uint8) << 3)
                | (mis.astype(jnp.uint8) << 4)
            )
        else:
            ptr = None

        return (h_new, h1, e_new, f_new, pen), ptr

    (h, _, _, _, penalty), ptrs = jax.lax.scan(
        step,
        (h0, h0, e0, f0, pen0),
        jnp.arange(1, 2 * L + 1, dtype=jnp.int32),
    )
    return penalty, ptrs  # ptrs: [2L, B, W] uint8 (diag d at index d-1)


@functools.partial(jax.jit, static_argnames=("x", "o", "e"))
def nw_penalty(read_codes, read_len, ref_codes, ref_len, x=1, o=1, e=1):
    """Exact global alignment penalty, no traceback. int32[B]."""
    pen, _ = _wavefront(read_codes, ref_codes, read_len, ref_len, x, o, e, False)
    return pen


@functools.partial(jax.jit, static_argnames=("x", "o", "e"))
def nw_align(read_codes, read_len, ref_codes, ref_len, x=1, o=1, e=1):
    """Exact global alignment with traceback.

    Returns (penalty int32[B], ops int8[B, 2L]) where ops lists OP_* codes in
    REVERSE alignment order (traceback order), OP_NONE-padded. Use
    asm_tpu.ops.cigar.ops_to_cigar to render CIGAR strings.
    """
    B, L = read_codes.shape
    W = L + 1
    penalty, ptrs = _wavefront(
        read_codes, ref_codes, read_len, ref_len, x, o, e, True
    )
    ptrs_flat = ptrs.reshape(-1)  # [(2L) * B * W]
    rows = jnp.arange(B, dtype=jnp.int32)

    def fetch(i, j):
        d = i + j  # in [1, 2L]; byte for diag d lives at index d-1
        flat = (d - 1) * (B * W) + rows * W + i
        return ptrs_flat[jnp.clip(flat, 0, ptrs_flat.shape[0] - 1)]

    def body(t, state):
        i, j, st, ops = state
        active = (i > 0) | (j > 0)
        byte = fetch(i, j)
        ptr_h = byte & 3
        e_open = (byte >> 2) & 1
        f_open = (byte >> 3) & 1
        mis = (byte >> 4) & 1

        # state: 0 = H, 1 = E (in a read-gap run), 2 = F (ref-gap run)
        go_diag = (st == 0) & (ptr_h == 0)
        go_e = ((st == 0) & (ptr_h == 1)) | (st == 1)
        go_f = ((st == 0) & (ptr_h == 2)) | (st == 2)

        op = jnp.where(
            go_diag,
            jnp.where(mis == 1, OP_X, OP_EQ),
            jnp.where(go_e, OP_I, OP_D),
        ).astype(jnp.int8)
        op = jnp.where(active, op, OP_NONE).astype(jnp.int8)
        ops = ops.at[rows, t].set(op)

        di = jnp.where(go_diag | go_e, 1, 0)
        dj = jnp.where(go_diag | go_f, 1, 0)
        new_st = jnp.where(
            go_diag,
            0,
            jnp.where(
                go_e,
                jnp.where(e_open == 1, 0, 1),
                jnp.where(f_open == 1, 0, 2),
            ),
        )
        i = jnp.where(active, i - di, i)
        j = jnp.where(active, j - dj, j)
        st = jnp.where(active, new_st, st).astype(jnp.int32)
        return i, j, st, ops

    ops0 = jnp.zeros((B, 2 * L), dtype=jnp.int8)
    st0 = jnp.zeros((B,), dtype=jnp.int32)
    _, _, _, ops = jax.lax.fori_loop(
        0, 2 * L, body, (read_len.astype(jnp.int32), ref_len.astype(jnp.int32), st0, ops0)
    )
    return penalty, ops
