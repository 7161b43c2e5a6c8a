"""Fused Pallas TPU kernel for the NW/Gotoh wavefront (penalty only).

Same recurrence and conventions as asm_tpu.kernels.nw (which remains the
conformance anchor and the traceback path). The XLA scan streams four
[B, 128] carry arrays through HBM on every one of the 2L diagonal steps —
~0.5 GB/step at B=131k; this kernel keeps the whole wavefront state in
VMEM for a _TB-pair tile and only touches HBM for codes in / penalties out.

Layout: positions across lanes (cells i in [1, L] at lane q = i-1, exactly
the XLA kernel's scheme incl. the virtual i == 0 border), _TB pairs across
sublanes per grid step. The reversed-ref diagonal window is maintained
incrementally: three [_TB, L] registers hold the sliding 3L-wide padded
reverse-ref window, funnel-shifted one lane per diagonal (pltpu.roll +
lane-0 patch) instead of re-slicing per step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = 1 << 29
_TB = 128  # pairs per tile


def _nw_kernel(L, x, o, e, rc_ref, fc_ref, rl_ref, fl_ref, pen_ref, st_ref):
    shape = (_TB, L)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    ii = lane + 1  # cell index i at lane q

    m = jnp.minimum(rl_ref[...], L)
    n = jnp.minimum(fl_ref[...], L)
    mn = m + n

    aa = rc_ref[...]  # cell i uses read[i-1] = lane q

    # reversed ref (rev[q] = ref[L-1-q]) arrives pre-flipped from XLA —
    # Mosaic has no lowering for the `rev` primitive
    rev = fc_ref[...]

    # sliding window V[q] = pad[(2L+1-d) + q] over pad = [zeros, rev, zeros]
    # at d=1 the window is the top pad block; U is the block below it (rev)
    # and T the bottom pad. Each step the window slides down one index:
    # V <- funnel(V, U), U <- funnel(U, T), T <- shift-in sentinel.
    sent = jnp.full(shape, -2, jnp.int32)

    # st_ref rows: 0 h1, 1 h2, 2 e1, 3 f1, 4 pen, 5 V, 6 U, 7 T
    st_ref[0] = jnp.full(shape, INF, jnp.int32)
    st_ref[1] = jnp.full(shape, INF, jnp.int32)
    st_ref[2] = jnp.full(shape, INF, jnp.int32)
    st_ref[3] = jnp.full(shape, INF, jnp.int32)
    # m == 0 pairs end on the virtual top border: closed form
    st_ref[4] = jnp.broadcast_to(
        jnp.where(mn == 0, 0, jnp.where(m == 0, o + (mn - 1) * e, INF)),
        shape,
    )
    # init = the d=0 window position (start = 2L+1), one slide before the
    # first step's window: V0[q] = pad[2L+1+q] (all sentinel),
    # U0[q] = pad[L+1+q] = rev[q+1] with sentinel at the top lane,
    # T0[q] = pad[1+q] = sentinel except rev[0] at the top lane.
    r1 = pltpu.roll(rev, L - 1, axis=1)  # r1[q] = rev[q+1], r1[L-1] = rev[0]
    st_ref[5] = sent
    st_ref[6] = jnp.where(lane == L - 1, -2, r1)
    st_ref[7] = jnp.where(lane == L - 1, r1, -2)

    def h_top(dd):
        return jnp.where(dd <= 0, jnp.where(dd == 0, 0, INF), o + (dd - 1) * e)

    def funnel(v, u):
        """new[q] = v[q-1], new[0] = u[L-1] (slide the window one down)."""
        vr = pltpu.roll(v, 1, axis=1)
        ur = pltpu.roll(u, 1, axis=1)
        return jnp.where(lane == 0, ur, vr)

    def shift_fill(arr, fill):
        """value at lane q-1; lane 0 reads the (scalar) fill."""
        r = pltpu.roll(arr, 1, axis=1)
        return jnp.where(lane == 0, fill, r)

    def body(d, _):
        h1 = st_ref[0]
        h2 = st_ref[1]
        e1 = st_ref[2]
        f1 = st_ref[3]

        # slide the reverse-ref window FIRST: at step d the window must be
        # pad[(2L+1-d)+q]; the init (d=1 window) is the top pad block
        V = funnel(st_ref[5], st_ref[6])
        U = funnel(st_ref[6], st_ref[7])
        T = shift_fill(st_ref[7], -2)
        st_ref[5] = V
        st_ref[6] = U
        st_ref[7] = T
        bb = V  # == b_rev_pad[(2L+1-d') .. ] for d' = d+1... see note below

        e_open = shift_fill(h1, h_top(d - 1)) + o
        e_ext = shift_fill(e1, INF) + e
        e_new = jnp.minimum(e_open, e_ext)
        f_new = jnp.minimum(h1 + o, f1 + e)

        mis = (aa != bb).astype(jnp.int32)
        sub = shift_fill(h2, h_top(d - 2)) + x * mis

        h_new = jnp.minimum(sub, jnp.minimum(e_new, f_new))

        border_pen = o + (d - 1) * e
        at_left = ii == d
        h_new = jnp.where(at_left, border_pen, h_new)
        e_new = jnp.where(at_left, border_pen, e_new)
        f_new = jnp.where(at_left, INF, f_new)

        pen = st_ref[4]
        st_ref[4] = jnp.where(
            (d == mn) & (ii == m) & (m > 0), h_new, pen
        )

        st_ref[0] = h_new
        st_ref[1] = h1
        st_ref[2] = e_new
        st_ref[3] = f_new
        return 0

    jax.lax.fori_loop(1, 2 * L + 1, body, 0)

    # pen holds the result at lane m-1 for each pair (single set lane);
    # fold over lanes with the "only one lane differs from the masked
    # default" trick: take min over lanes of (pen where set else INF),
    # then the m == 0 closed form stored as a full row wins via min too.
    pen = st_ref[4]
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
            pl.BlockSpec((_TB, L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TB, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TB, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TB, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BP, 1), jnp.int32),
        scratch_shapes=[pltpu.VMEM((8, _TB, L), jnp.int32)],
        interpret=interpret,
    )(
        read_codes.astype(jnp.int32),
        jnp.flip(ref_codes.astype(jnp.int32), axis=1),  # pre-reversed
        read_len.astype(jnp.int32).reshape(BP, 1),
        ref_len.astype(jnp.int32).reshape(BP, 1),
    )
    return pen.reshape(BP)[:B]
