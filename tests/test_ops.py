"""Unit tests for the vector bit-op replacements (asm_tpu.ops.bitops)."""

import numpy as np
import jax.numpy as jnp

from asm_tpu.ops.bitops import (
    flip_short_hurdles,
    next_one_index,
    next_zero_index,
    prefix_count,
    count_between,
)


def naive_next_one(h):
    L = len(h)
    out = np.full(L + 1, L, dtype=np.int32)
    for p in range(L - 1, -1, -1):
        out[p] = p if h[p] else out[p + 1]
    return out


def test_next_one_zero(rng):
    for _ in range(20):
        h = rng.integers(0, 2, size=37).astype(np.int8)
        got = np.asarray(next_one_index(jnp.asarray(h)))
        np.testing.assert_array_equal(got, naive_next_one(h))
        got0 = np.asarray(next_zero_index(jnp.asarray(h)))
        np.testing.assert_array_equal(got0, naive_next_one(1 - h))


def test_prefix_count_between(rng):
    h = rng.integers(0, 2, size=(4, 50)).astype(np.int8)
    cum = prefix_count(jnp.asarray(h))
    np.testing.assert_array_equal(
        np.asarray(cum), np.concatenate([np.zeros((4, 1), int), h.cumsum(1)], 1)
    )
    lo = jnp.asarray([0, 10, 49, 60])
    hi = jnp.asarray([50, 5, 50, 10])
    got = np.asarray(count_between(cum, lo, hi))
    exp = [h[0].sum(), 0, h[2, 49:50].sum(), 0]
    np.testing.assert_array_equal(got, exp)


def test_flip_short_hurdles():
    h = jnp.asarray([[1, 0, 1, 1, 0, 1, 0, 0, 1]], dtype=jnp.int8)
    out = np.asarray(flip_short_hurdles(h, 1))[0]
    # isolated ones (index 0? neighbor idx1=0 -> flipped; idx 5 and 8 isolated)
    np.testing.assert_array_equal(out, [0, 0, 1, 1, 0, 0, 0, 0, 0])


def test_batched_shapes(rng):
    h = rng.integers(0, 2, size=(3, 5, 40)).astype(np.int8)
    assert next_one_index(jnp.asarray(h)).shape == (3, 5, 41)
    assert prefix_count(jnp.asarray(h)).shape == (3, 5, 41)
