"""Dataset generator conformance — error-count + distribution semantics.

The reference's error count is ceil(length * rate) computed in FLOAT32
(benchmark_dataset.h:153-156); at the published rate 0.15 and length 100
that is 16, not the double-precision 15 (the root cause of round 1's
+3.4 pp greedy-accuracy deviation at err=0.15)."""

import numpy as np

from asm_tpu.data.generator import (
    generate_dataset,
    generate_dataset_arrays,
    nominal_errors,
)


def test_nominal_errors_is_float32_ceil():
    # only .15 among the published rates rounds UP in float32
    assert nominal_errors(100, 0.05) == 5
    assert nominal_errors(100, 0.10) == 10
    assert nominal_errors(100, 0.15) == 16
    assert nominal_errors(100, 0.20) == 20


def _edit_distance(a, b):
    m, n = len(a), len(b)
    d = np.arange(n + 1)
    for i in range(1, m + 1):
        prev = d.copy()
        d[0] = i
        for j in range(1, n + 1):
            d[j] = min(prev[j] + 1, d[j - 1] + 1,
                       prev[j - 1] + (a[i - 1] != b[j - 1]))
    return int(d[n])


def test_exact_mode_injects_nominal_error_budget():
    """In exact mode every pair receives exactly nominal_errors error
    EVENTS. The realized edit distance is <= the budget: events collide
    on positions (E[distinct of 16 draws over 100] ~ 14.8) and 1/4 of
    mismatch draws redraw the same base, so the expectation is ~0.7x."""
    reads, refs = generate_dataset(40, 100, 0.15, 0.96, seed=7)
    budget = nominal_errors(100, 0.15)
    dists = [_edit_distance(a, b) for a, b in zip(reads, refs)]
    assert max(dists) <= budget
    assert budget * 0.55 < np.mean(dists) <= budget


def test_array_and_string_generators_share_error_budget():
    rc, rl, fc, fl = generate_dataset_arrays(64, 100, 0.15, 0.96, seed=3)
    # every ref length within [length - nerr, length + nerr]
    assert int(rl.max()) == 100
    nerr = nominal_errors(100, 0.15)
    assert np.all(np.abs(fl - 100) <= nerr)
    # at mismatch_rate .96 with 16 errors, some pair in 64 should carry
    # at least one indel; none may exceed the budget
    assert np.any(fl != 100)


def test_real_profile_corpus_rates():
    """The SRR611076 stand-in must realize the published per-base rates
    (README.md:70-76) within sampling error."""
    from asm_tpu.data.generator import generate_real_profile_arrays

    rc, rl, fc, fl = generate_real_profile_arrays(4000, 100, seed=5)
    assert rc.shape == (4000, 128)
    # indels shift lengths both ways
    assert fl.min() < 100 < fl.max()
    # realized mismatch rate on equal-length pairs (no indel interference)
    same = fl == 100
    mis = (rc[same, :100] != fc[same, :100]).mean()
    assert 0.020 < mis < 0.030, mis
    # ~0.1% per-base indel rate -> ~0.1 events/read -> ~400 affected reads
    n_indel = int((fl != 100).sum())
    assert 200 < n_indel < 600, n_indel
