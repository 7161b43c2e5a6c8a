"""Batched Shifted-Hamming-Distance (SHD) pre-filter.

TPU-native equivalent of bit_vec_filter_sse/avx
(GASMA/benchmark/LEAP_SIMD/SHD.cpp:157-385): a cheap gate that rejects read
pairs whose edit distance certainly exceeds max_error before running the
full LEAP/NW kernels (used optionally by SIMD_ED::run_levenshtein/affine,
SIMD_ED.cpp:270,489).

Algorithm (per pair, all shifts vectorized over the batch):
  1. For each shift j in 0..max_error of read vs ref (both directions),
     compute the masked Hamming mask: positions past `length` are cleared
     (the MASK_SSE_END tables, mask.cpp:18) and the first j positions of a
     j-shifted mask are cleared (MASK_SSE_BEG, mask.cpp:7).
  2. "Flip false zeros": interior 0-runs of length <= 2 bounded by 1s are
     amended to 1s — the clean formulation of the reference's MASK_SRS
     shuffle-LUT speckle pass (SHD.cpp:21-155), from the SHD paper's
     speculative removal of short streaks.
  3. AND all masks together; a position is 0 iff SOME shift explains it.
  4. Count 1-RUNS per 4-bit nibble (POPCOUNT_SHD, popcount.cpp:41-73) and
     pass iff the count is <= max_error.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from asm_tpu.ops.bitops import shift_toward_0, shift_away_0


def _flip_false_zeros(v: jax.Array) -> jax.Array:
    """Amend interior 0-runs of length <= 2 bounded by 1s."""
    l1 = shift_toward_0(v, 1, fill=0)
    r1 = shift_away_0(v, 1, fill=0)
    l2 = shift_toward_0(v, 2, fill=0)
    r2 = shift_away_0(v, 2, fill=0)
    single = (r1 & l1) == 1  # 1 0 1
    double = ((r1 & l2) == 1) | ((r2 & l1) == 1)  # 1 0 0 1 (either zero)
    return jnp.where((v == 0) & (single | double), 1, v).astype(v.dtype)


def _count_nibble_runs(v: jax.Array) -> jax.Array:
    """POPCOUNT_SHD semantics: 1-runs counted per 4-bit nibble
    (a run spanning a nibble boundary counts once per nibble)."""
    L = v.shape[-1]
    prev = shift_away_0(v, 1, fill=0)
    pos = jax.lax.broadcasted_iota(jnp.int32, v.shape, v.ndim - 1)
    starts = (v == 1) & ((prev == 0) | (pos % 4 == 0))
    return starts.sum(axis=-1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("max_error",))
def shd_filter(read_codes, read_len, ref_codes, ref_len, max_error: int = 3):
    """Returns bool[B]: True = pair may be within max_error (keep),
    False = certainly rejected. cf. SHD.cpp:157-243."""
    B, L = read_codes.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    length = jnp.minimum(jnp.minimum(read_len, ref_len), L)
    len_mask = (pos < length[:, None]).astype(jnp.int8)

    def ham(a, b):
        return (a != b).astype(jnp.int8)

    diff = _flip_false_zeros(ham(read_codes, ref_codes) & len_mask)
    for j in range(1, max_error + 1):
        beg_mask = (pos >= j).astype(jnp.int8) & len_mask
        d1 = ham(shift_away_0(read_codes, j, fill=-1), ref_codes) & beg_mask
        d2 = ham(shift_away_0(ref_codes, j, fill=-2), read_codes) & beg_mask
        diff = diff & _flip_false_zeros(d1)
        diff = diff & _flip_false_zeros(d2)

    return _count_nibble_runs(diff) <= max_error
