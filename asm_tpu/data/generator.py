"""Seeded WFA-style simulated read-pair generator.

Re-implements the reference's Dataset class
(GASMA/benchmark/benchmark_dataset.h:61-254, itself adopted from
smarco/WFA tools/generate_dataset.c): random ACGT patterns of fixed length;
the candidate text is a copy with ceil(len * error_rate) errors injected
(exact mode) or a uniform 0..ceil count, each error a mismatch with
probability `mismatch_rate` else an insertion or deletion (50/50,
benchmark_dataset.h:163-181), applied SEQUENTIALLY at random positions of
the evolving text (so later errors can hit earlier ones).

Differences from the reference: a seeded NumPy Generator replaces the
unseeded libc rand() (benchmark_dataset.h:190,223 srand(time) — the
reference's corpora are not reproducible run-to-run; ours are).
The benchmark config is 5M pairs, length 100, mismatch_rate 0.96, exact
(benchmark.cpp:14-20).
"""

from __future__ import annotations

import math

import numpy as np

_ALPHABET = np.array(list("ACGT"))


def generate_dataset(
    num_reads: int,
    length: int,
    error_rate: float,
    mismatch_rate: float = 0.96,
    exact_error_rate: bool = True,
    seed: int = 0,
) -> tuple[list[str], list[str]]:
    """Return (patterns, texts) — `num_reads` read/ref pairs."""
    if not 0 <= error_rate <= 0.7:
        raise ValueError(f"error rate {error_rate} out of [0, 0.7]")
    if not 0 <= mismatch_rate <= 1:
        raise ValueError(f"mismatch rate {mismatch_rate} out of [0, 1]")
    rng = np.random.default_rng(seed)
    patterns: list[str] = []
    texts: list[str] = []
    max_errors = math.ceil(length * error_rate)
    for _ in range(num_reads):
        pattern = rng.integers(0, 4, size=length)
        num_errors = (
            max_errors
            if exact_error_rate
            else int(rng.integers(0, max_errors + 1))
        )
        text = list(pattern)
        for _ in range(num_errors):
            r = rng.random()
            if r <= mismatch_rate:
                pos = int(rng.integers(0, len(text)))
                text[pos] = int(rng.integers(0, 4))
            elif rng.integers(1, 3) == 1:  # deletion
                pos = int(rng.integers(0, len(text)))
                del text[pos]
            else:  # insertion
                pos = int(rng.integers(0, len(text)))
                text.insert(pos, int(rng.integers(0, 4)))
        patterns.append("".join(_ALPHABET[pattern]))
        texts.append("".join(_ALPHABET[np.array(text, dtype=np.int64)])
                     if text else "")
    return patterns, texts


def dataset_filename(
    num_reads: int, length: int, error_rate: float, exact: bool = True
) -> str:
    """Reference naming convention (benchmark_dataset.h:242-253)."""
    suffix = "eq" if exact else "lt_eq"
    return f"simulated_{num_reads}_{length}_{error_rate:.6f}_{suffix}.seq"
