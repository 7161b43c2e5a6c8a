"""Unit tests for the packed-word bit ops (asm_tpu.ops.packed)."""

import numpy as np
import jax.numpy as jnp

from asm_tpu.ops.packed import (
    pack_rows,
    ctz32,
    first_set_from,
    count_range,
    mask_ge,
)


def test_pack_roundtrip(rng):
    rows = rng.integers(0, 2, size=(3, 5, 128)).astype(np.int8)
    packed = np.asarray(pack_rows(jnp.asarray(rows)))
    assert packed.shape == (3, 5, 4)
    for b in range(3):
        for l in range(5):
            for w in range(4):
                word = 0
                for p in range(32):
                    word |= int(rows[b, l, 32 * w + p]) << p
                assert packed[b, l, w] == word


def test_ctz32():
    vals = np.array([0, 1, 2, 4, 0x80000000, 0xFFFFFFFF, 0x00010000],
                    dtype=np.uint32)
    got = np.asarray(ctz32(jnp.asarray(vals)))
    np.testing.assert_array_equal(got, [32, 0, 1, 2, 31, 0, 16])


def test_first_set_from(rng):
    for _ in range(10):
        row = rng.integers(0, 2, size=128).astype(np.int8)
        packed = pack_rows(jnp.asarray(row[None]))
        for c in [-5, 0, 1, 31, 32, 63, 100, 127, 128, 200]:
            got = int(first_set_from(packed, jnp.asarray([c]))[0])
            cand = np.nonzero(row & (np.arange(128) >= c))[0]
            exp = int(cand[0]) if cand.size else 128
            assert got == exp, (c, got, exp)


def test_count_range(rng):
    row = rng.integers(0, 2, size=128).astype(np.int8)
    packed = pack_rows(jnp.asarray(row[None]))
    for lo, hi in [(0, 128), (5, 37), (33, 32), (-4, 10), (120, 300),
                   (64, 64), (31, 33)]:
        got = int(count_range(packed, jnp.asarray([lo]), jnp.asarray([hi]))[0])
        exp = int(row[max(lo, 0): max(hi, 0)].sum()) if hi > lo else 0
        assert got == exp, (lo, hi, got, exp)


def test_mask_ge_boundaries():
    m = np.asarray(mask_ge(jnp.asarray([0, 31, 32, 64, 128, -3]), 4))
    assert m[0].tolist() == [0xFFFFFFFF] * 4
    assert m[1].tolist() == [0x80000000, 0xFFFFFFFF, 0xFFFFFFFF, 0xFFFFFFFF]
    assert m[2].tolist() == [0, 0xFFFFFFFF, 0xFFFFFFFF, 0xFFFFFFFF]
    assert m[3].tolist() == [0, 0, 0xFFFFFFFF, 0xFFFFFFFF]
    assert m[4].tolist() == [0, 0, 0, 0]
    assert m[5].tolist() == [0xFFFFFFFF] * 4
