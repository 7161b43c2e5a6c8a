"""Device-side full-corpus coverage.

The reference computes coverage for EVERY aligned pair inside the
benchmark (benchmark_utils.h:256-258): does the greedy alignment's LCM
(long consecutive matches, threshold 1) cover the NW alignment's LCM
(threshold 3)? Round 1 computed this host-side from decoded CIGAR strings
and had to sample. This module moves the whole corpus onto the device:

  1. Both LCM strings are subsequences of the READ — the C++ collects
     s1 (read) characters over '='/'M' runs of length >= threshold
     (benchmark_coverage.h:53-60). So each LCM is fully described by a
     boolean READ-POSITION mask:
       greedy mask  — `greedy_match_mask` over the (op, run) slot buffers
                      (threshold 1: every 'M' run),
       NW mask      — nw_align(..., match_mask_threshold=3), emitted
                      during the traceback scan itself.
  2. If the NW mask is a positional SUBSET of the greedy mask, the greedy
     LCM contains the NW LCM as a positional subsequence — covers() is
     True with identical characters (sound, no false positives).
  3. The rare remainder (NW matched a read position the greedy M runs
     skipped) falls back to the exact host/native string check: covers()
     is CHARACTER-based (benchmark_coverage.h:73-91), so a different
     position with equal characters can still cover. The fallback set is
     a few percent of pairs, so full-corpus exactness costs a sampled
     corpus's host time.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

OP_M = 5
OP_I = 3


@functools.partial(jax.jit, static_argnames=("L", "threshold"))
def greedy_match_mask(cigar_ops, cigar_runs, L: int, threshold: int = 1):
    """bool[B, L]: read positions inside greedy 'M' runs of length >=
    threshold (the positions the reference's LCM string collects at
    threshold 1, benchmark_coverage.h:53-60 over the greedy CIGAR).

    cigar_ops/cigar_runs: the greedy slot buffers [B, C] (empty slots have
    run 0). Read-consuming slots: 'I' leaps and 'M' runs; 'D' leaps
    consume only the ref.
    """
    B, C = cigar_ops.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    r = jnp.zeros((B,), jnp.int32)  # read cursor
    mask = jnp.zeros((B, L), bool)
    ops = cigar_ops.astype(jnp.int32)
    runs = cigar_runs.astype(jnp.int32)
    for c in range(C):
        op = ops[:, c]
        run = runs[:, c]
        is_m = (op == OP_M) & (run > 0)
        mark = is_m & (run >= threshold)
        mask = mask | (
            mark[:, None] & (pos >= r[:, None]) & (pos < (r + run)[:, None])
        )
        consumes = jnp.where(is_m | (op == OP_I), run, 0)
        r = r + consumes
    return mask


@jax.jit
def positional_covered(greedy_mask, nw_mask):
    """bool[B]: True where the NW LCM positions are a subset of the
    greedy LCM positions (a sound certificate for covers() == True)."""
    return ~jnp.any(nw_mask & ~greedy_mask, axis=1)
