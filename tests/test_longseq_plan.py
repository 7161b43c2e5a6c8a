"""The long-sequence fused-CIGAR dispatch planner (tools/longseq_headline
.plan_cigar_chunks): over-VMEM chunks must SPLIT at the deepest fitting
energy bound so only the true deep residue (energy > E_fit) rides the
XLA history path — and the plan must cover every pair exactly once.

Round-5 context: at L=512 / af=200 the tail chunk's bucketized bound
(200) exceeds VMEM even at the Mosaic-minimum 1024 tile; before the
split, the whole chunk (6.25% of pairs) fell back to XLA."""

import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from asm_tpu.config import AlignConfig  # noqa: E402


def _plan(energy_sorted, L=512, tile=2048, csize=None):
    from tools.longseq_headline import plan_cigar_chunks

    lcfg = AlignConfig(x=1, o=1, e=1, k=3, max_len=L)
    csize = csize or len(energy_sorted) // 16
    return plan_cigar_chunks(np.asarray(energy_sorted, np.int64),
                             lcfg, tile, csize), lcfg


def _coverage(pairs, plans, split_specs, xla_spans, csize):
    seen = np.zeros(pairs, np.int32)
    for base, _, _ in plans:
        seen[base: base + csize] += 1
    for base, plen in split_specs:
        seen[base: base + plen] += 1
    for lo, hi in xla_spans:
        seen[lo:hi] += 1
    return seen


def test_split_covers_exactly_once_and_bounds_residue():
    from asm_tpu.kernels.leap_pallas import leap_cigar_tile

    rng = np.random.default_rng(42)
    pairs, csize = 1 << 16, 1 << 12
    # energy profile like the L=512 err=0.05 corpus: mostly shallow,
    # deep tail up to the af threshold (200)
    e = np.sort(np.minimum(rng.gamma(2.0, 12.0, pairs).astype(np.int64),
                           200))
    (plans, splits, xla, E_fit, t_fit), lcfg = _plan(e, csize=csize)

    assert (_coverage(pairs, plans, splits, xla, csize) == 1).all()
    # E_fit is maximal: it fits, the next bucket up does not
    assert E_fit is not None and t_fit >= 1024
    assert leap_cigar_tile(dataclasses.replace(
        lcfg, leap_max_energy=E_fit), max_tile=2048) == t_fit
    assert leap_cigar_tile(dataclasses.replace(
        lcfg, leap_max_energy=E_fit + 8), max_tile=2048) is None
    # whole-chunk plans: per-chunk max energy <= their bound, bound fits
    for base, Eb, t_c in plans:
        assert e[base: base + csize].max() <= Eb
        assert leap_cigar_tile(dataclasses.replace(
            lcfg, leap_max_energy=Eb), max_tile=2048) == t_c
    # split prefixes stay within E_fit and are tile-aligned
    assert splits, "tail chunk should have split"
    for base, plen in splits:
        assert plen % t_fit == 0
        assert e[base + plen - 1] <= E_fit
    # the XLA residue holds at most t_fit-1 pairs per split that the
    # tile rounding displaced; everything deeper is genuinely > E_fit
    resid = np.concatenate([e[lo:hi] for lo, hi in xla])
    assert (resid <= E_fit).sum() < t_fit * max(1, len(splits))


def test_shallow_corpus_never_splits():
    e = np.sort(np.full(1 << 14, 12, np.int64))
    (plans, splits, xla, _, _), _ = _plan(e, csize=1 << 12)
    assert not splits and not xla
    assert (_coverage(1 << 14, plans, splits, xla, 1 << 12) == 1).all()


def test_l256_fits_whole_chunks():
    # an L=256 corpus with the published energy profile (max ~130,
    # RESULTS_headlines long-seq section) buckets under bounds that fit
    # VMEM at some tile: no chunk may fall off the fused path
    e = np.sort(np.minimum(
        np.random.default_rng(7).gamma(2.0, 10.0, 1 << 14).astype(
            np.int64), 200))
    (plans, splits, xla, _, _), _ = _plan(e, L=256, csize=1 << 12)
    assert not xla and not splits
    assert (_coverage(1 << 14, plans, splits, xla, 1 << 12) == 1).all()
