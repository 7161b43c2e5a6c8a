"""Difficulty-aware scheduling: permutation correctness + proxy quality."""

import numpy as np
import jax.numpy as jnp

from asm_tpu.config import AlignConfig
from asm_tpu.data.generator import generate_dataset_arrays
from asm_tpu.kernels.greedy import greedy_align
from asm_tpu.parallel.schedule import (
    difficulty_order,
    difficulty_proxy,
    inverse_permutation,
)


def test_inverse_permutation_roundtrip():
    rng = np.random.default_rng(0)
    perm = rng.permutation(257)
    inv = inverse_permutation(perm)
    x = rng.integers(0, 100, size=257)
    np.testing.assert_array_equal(x[perm][inv], x)


def test_sorted_results_match_unsorted_after_unpermute():
    cfg = AlignConfig(max_steps=24)
    corpus = generate_dataset_arrays(64, 100, 0.1, 0.9, seed=3)
    rc, rl, fc, fl = corpus
    ref = greedy_align(*[jnp.asarray(v) for v in corpus], cfg)

    perm = difficulty_order(rc, rl, fc, fl)
    got = greedy_align(
        jnp.asarray(rc[perm]), jnp.asarray(rl[perm]),
        jnp.asarray(fc[perm]), jnp.asarray(fl[perm]), cfg,
    )
    inv = inverse_permutation(perm)
    np.testing.assert_array_equal(
        np.asarray(got["cost"])[inv], np.asarray(ref["cost"])
    )
    np.testing.assert_array_equal(
        np.asarray(got["steps"])[inv], np.asarray(ref["steps"])
    )


def test_proxy_orders_tiles_by_steps():
    """Sorting by the proxy must concentrate step counts: the mean of
    per-tile step maxima over sorted tiles should be well below the
    global max (that's the entire point of the schedule)."""
    cfg = AlignConfig(max_steps=32)
    corpus = generate_dataset_arrays(512, 100, 0.1, 0.9, seed=11)
    rc, rl, fc, fl = corpus
    perm = difficulty_order(rc, rl, fc, fl)
    out = greedy_align(
        jnp.asarray(rc[perm]), jnp.asarray(rl[perm]),
        jnp.asarray(fc[perm]), jnp.asarray(fl[perm]), cfg,
    )
    steps = np.asarray(out["steps"])
    tile = 64
    tile_max = steps.reshape(-1, tile).max(axis=1)
    assert tile_max.mean() < steps.max(), (
        "difficulty proxy failed to separate easy from hard pairs"
    )
    # and the proxy itself must correlate positively with actual steps
    prox = difficulty_proxy(rc, rl, fc, fl)[perm].astype(np.float64)
    corr = np.corrcoef(prox, steps)[0, 1]
    assert corr > 0.3, f"proxy/steps correlation too weak: {corr:.3f}"


def test_quantized_step_bounds():
    """Bench cold-start contract: bounds are pow2, strictly above the
    measured max, floored at 4 — the hot chunk lands on the same
    max_steps a cold heuristic run compiles (32 for the benchmark
    corpus), so the driver's second run compiles nothing new."""
    import numpy as np

    from asm_tpu.parallel import quantized_step_bounds

    steps = np.sort(np.concatenate([
        np.full(100, 3), np.full(100, 27)
    ]))
    bounds = quantized_step_bounds(steps, 100)
    assert bounds == [8, 32]
    for b, mx in zip(bounds, (3, 27)):
        assert b > mx and (b & (b - 1)) == 0
    assert quantized_step_bounds(np.zeros(10, np.int32), 10) == [4]
