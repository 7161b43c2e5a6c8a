"""lt_eq-corpus quality pins (VERDICT r4 item #2).

The reference's second published quality table
(GASMA/benchmark/README.md:21-101) was produced on `*_lt_eq.seq`
corpora: each pair's error count drawn uniformly in [0, ceil(err*len)]
instead of exactly ceil (benchmark_dataset.h `exact` flag). The README
reports Greedy 99.741%/99.913% (acc/cov) at err=0.05 and 98.142%/99.322%
at err=0.10 — but those rows are NOT reproducible with the mounted
reference source: the COMPILED reference itself (build_ref/ref_driver,
tools/validate_vs_reference.py toolchain) scores 97.10% / 91.10% /
82.67% / 76.33% at err=0.05/0.10/0.15/0.20 on regenerated 20k-pair
lt_eq corpora (measured 2026-08-20; the README rows predate the mounted
code state — its default significance priors 0.80/0.0667/0.1333,
hurdle_matrix.h:557-559, and the 0.95/0.02/0.03 alternate at :481-483
both give the same accuracy). Our kernel agrees with the compiled
binary on 99.7-99.9% of pairs at every rate (residual = documented
heuristic ties) and scores marginally HIGHER against the NW optimum
(97.14% vs 97.10% at err=0.05).

These tests pin our kernel's lt_eq quality at the compiled-reference
level, and pin bit-equality with the scalar emulator when the
significance priors are set OFF-default (the reference's main accuracy
tuning surface, hurdle_matrix.h:536-538).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from asm_tpu import AlignConfig, greedy_align, nw_align
from asm_tpu.data.generator import generate_dataset
from asm_tpu.encoding import encode_batch
from asm_tpu.metrics.coverage import check_coverage
from asm_tpu.ops.cigar import batch_greedy_cigars, batch_nw_cigars

CFG = AlignConfig(x=1, o=1, e=1, k=3)


def _corpus(n, err, seed=42):
    reads, refs = generate_dataset(n, 100, err, 0.96,
                                   exact_error_rate=False, seed=seed)
    return reads, refs, list(map(jnp.asarray, encode_batch(reads, refs, 128)))


@pytest.mark.parametrize(
    "err,acc_floor,cov_floor",
    [
        # floors = compiled-reference level minus sampling noise margin
        # (measured at 20k pairs: acc 0.9710/0.9110, cov 0.987/0.976)
        (0.05, 0.960, 0.975),
        (0.10, 0.895, 0.960),
    ],
)
def test_lt_eq_greedy_quality(err, acc_floor, cov_floor):
    n, s = 4096, 1024
    reads, refs, batch = _corpus(n, err)
    pen, nw_ops = nw_align(*batch)
    g = greedy_align(*batch, CFG)
    acc = float(np.mean(np.asarray(g["cost"]) == np.asarray(pen)))
    assert acc >= acc_floor, f"lt_eq err={err}: accuracy {acc}"
    cigs = batch_greedy_cigars(
        {k: np.asarray(v)[:s] for k, v in g.items() if k.startswith("cigar")})
    nwc = batch_nw_cigars(np.asarray(nw_ops)[:s])
    cov = float(np.mean([
        check_coverage(a, b, c1, c2, 1, 3)
        for a, b, c1, c2 in zip(reads[:s], refs[:s], cigs, nwc)
    ]))
    assert cov >= cov_floor, f"lt_eq err={err}: coverage {cov}"


@pytest.mark.parametrize("priors", [(0.95, 0.02, 0.03), (0.6, 0.3, 0.1)])
def test_offdefault_priors_match_emulator(priors):
    """Significance priors exercised OFF-default: batched kernel cost ==
    scalar emulator per pair (the priors feed match/mismatch/indel_sig,
    hurdle_matrix.h:536-538 — an untested config axis is an
    unimplemented one)."""
    from asm_tpu.reference_impl.greedy_ref import greedy_ref

    mp, xp, ip = priors
    reads, refs, batch = _corpus(256, 0.10, seed=11)
    cfg = dataclasses.replace(CFG, match_prob=mp, mismatch_prob=xp,
                              indel_prob=ip)
    costs = np.asarray(greedy_align(*batch, cfg)["cost"])
    for a, b, c in zip(reads, refs, costs):
        ref_cost, _ = greedy_ref(a, b, match_prob=mp, mismatch_prob=xp,
                                 indel_prob=ip)
        assert ref_cost == int(c)


def test_offdefault_priors_change_behavior():
    """The priors must actually steer the heuristic: an extreme prior
    set produces a different walk on at least one pair of an indel-heavy
    corpus (guards against the knobs being silently ignored)."""
    reads, refs = generate_dataset(512, 100, 0.3, 0.5,
                                   exact_error_rate=True, seed=3)
    batch = list(map(jnp.asarray, encode_batch(reads, refs, 128)))
    base = np.asarray(greedy_align(*batch, CFG)["cigar_runs"])
    skew = dataclasses.replace(CFG, match_prob=0.4, mismatch_prob=0.55,
                               indel_prob=0.05)
    other = np.asarray(greedy_align(*batch, skew)["cigar_runs"])
    assert not np.array_equal(base, other)
