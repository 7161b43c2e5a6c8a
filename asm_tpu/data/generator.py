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

IMPORTANT quirk, reproduced deliberately: the reference computes
``num_errors = ceil(pattern_length * error_degree)`` in FLOAT32
(error_degree is a float member, benchmark_dataset.h:59,153-156), so at
error_rate=0.15 and length=100 it injects ceil(15.000001f) = 16 errors —
one MORE than the double-precision 15. Of the published rates
{.05,.10,.15,.20} only .15 rounds up, which is why a double-based
generator reproduces the reference's accuracy at every rate except .15
(the round-1 +3.4 pp outlier at that rate was exactly this).
"""

from __future__ import annotations

import math

import numpy as np

_ALPHABET = np.array(list("ACGT"))


def nominal_errors(length: int, error_rate: float) -> int:
    """ceil(length * rate) in float32 — the reference's exact expression
    (benchmark_dataset.h:153-156: uint64 * float promotes to float)."""
    return math.ceil(np.float32(length) * np.float32(error_rate))


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
    max_errors = nominal_errors(length, error_rate)
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


def generate_dataset_arrays(
    num_reads: int,
    length: int,
    error_rate: float,
    mismatch_rate: float = 0.96,
    exact_error_rate: bool = True,
    seed: int = 0,
    max_len: int = 128,
    pad_read: int = 4,
    pad_ref: int = 5,
    length_range: tuple[int, int] | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized generator emitting encoded arrays directly.

    Same error process as `generate_dataset` (sequential errors on the
    evolving text, benchmark_dataset.h:113-186) but applied to the whole
    batch at once — each error step is a batched gather/scatter over
    [N, L] arrays instead of a per-pair Python loop, which is what makes
    multi-million-pair corpora practical. RNG draw ORDER differs from the
    scalar version (per-step-across-pairs vs per-pair), so the two are
    distributionally, not bitwise, identical.

    length_range=(lo, hi) draws each pair's read length uniformly in
    [lo, hi] instead of the fixed `length` — the variable-length story
    the reference's real data has (its MASK_END machinery exists for
    exactly this, LEAP_SIMD/mask.cpp); the per-pair error count uses the
    same float32 ceil expression on the pair's own length. The fixed-
    length path (length_range=None) is byte-identical to before, so
    cached corpora stay valid.

    Returns (read_codes int8[N, max_len], read_len int32[N],
             ref_codes int8[N, max_len], ref_len int32[N]) with the
    framework's sentinel padding (encoding.PAD_READ / PAD_REF).
    """
    if not 0 <= error_rate <= 0.7:
        raise ValueError(f"error rate {error_rate} out of [0, 0.7]")
    if not 0 <= mismatch_rate <= 1:
        raise ValueError(f"mismatch rate {mismatch_rate} out of [0, 1]")
    rng = np.random.default_rng(seed)
    N = num_reads
    if length_range is not None:
        lo, hi = length_range
        if not 1 <= lo <= hi:
            raise ValueError(f"bad length_range {length_range}")
        lens = rng.integers(lo, hi + 1, size=N).astype(np.int32)
        length = hi
        err_cap = np.ceil(
            lens.astype(np.float32) * np.float32(error_rate)
        ).astype(np.int32)  # per-pair float32 ceil (see nominal_errors)
        max_errors = int(err_cap.max(initial=0))
    else:
        lens = np.full(N, length, dtype=np.int32)
        max_errors = nominal_errors(length, error_rate)
        err_cap = np.full(N, max_errors, dtype=np.int32)
    W = length + max_errors  # worst-case text length (all insertions)

    pattern = rng.integers(0, 4, size=(N, length), dtype=np.int8)
    text = np.full((N, W), 0, dtype=np.int8)
    text[:, :length] = pattern
    if length_range is not None:
        # bases past each pair's own length are don't-care in the text
        # evolution (all ops index < tlen) but must not leak into reads
        text[:, :length][np.arange(length)[None, :] >= lens[:, None]] = 0
    tlen = lens.copy()

    if exact_error_rate:
        nerr = err_cap.copy()
    elif length_range is None:  # original draw order: cached-corpus compat
        nerr = rng.integers(0, max_errors + 1, size=N).astype(np.int32)
    else:
        nerr = (rng.random(N) * (err_cap + 1)).astype(np.int32)

    cols = np.arange(W, dtype=np.int32)[None, :]  # [1, W]
    for step in range(max_errors):
        live = step < nerr  # pairs still receiving errors
        r = rng.random(N)
        is_mis = r <= mismatch_rate
        is_del = (~is_mis) & (rng.integers(1, 3, size=N) == 1)
        is_ins = (~is_mis) & (~is_del)
        pos = (rng.random(N) * tlen).astype(np.int32)  # uniform in [0, tlen)
        base = rng.integers(0, 4, size=N, dtype=np.int8)

        # gather index per row: deletion shifts the tail left, insertion
        # shifts it right; mismatch rows gather identity then scatter `base`.
        posc = pos[:, None]
        gather = np.where(
            (is_del & live)[:, None],
            cols + (cols >= posc),
            np.where((is_ins & live)[:, None], cols - (cols > posc), cols),
        )
        np.clip(gather, 0, W - 1, out=gather)
        text = np.take_along_axis(text, gather, axis=1)
        put = live & (is_mis | is_ins)
        rows = np.nonzero(put)[0]
        text[rows, pos[rows]] = base[rows]
        tlen = tlen + live * (is_ins.astype(np.int32) - is_del.astype(np.int32))

    read_codes = np.full((N, max_len), pad_read, dtype=np.int8)
    m = min(length, max_len)
    read_codes[:, :m] = pattern[:, :m]
    read_len = np.minimum(lens, max_len).astype(np.int32)
    # positions past each read's true length must stay sentinel
    rmask = np.arange(max_len)[None, :] >= read_len[:, None]
    read_codes[rmask] = pad_read

    ref_codes = np.full((N, max_len), pad_ref, dtype=np.int8)
    w = min(W, max_len)
    ref_codes[:, :w] = text[:, :w]
    # positions past each text's true length must stay sentinel
    mask = np.arange(max_len)[None, :] >= np.minimum(tlen, max_len)[:, None]
    ref_codes[mask] = pad_ref
    ref_len = np.minimum(tlen, max_len).astype(np.int32)
    return read_codes, read_len, ref_codes, ref_len


def generate_real_profile_arrays(
    num_reads: int,
    length: int = 100,
    mismatch_frac: float = 0.02452309963366200179,
    insert_frac: float = 0.00046834182131581764,
    delete_frac: float = 0.00055319598705419218,
    seed: int = 0,
    max_len: int = 128,
    pad_read: int = 4,
    pad_ref: int = 5,
    length_range: tuple[int, int] | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Synthetic stand-in for the reference's real-data corpus.

    The reference benchmarks a corpus derived from Illumina run SRR611076
    (benchmark.cpp:28-30) and publishes only its error profile: ~2.452%
    mismatches, ~0.047% insertions, ~0.055% deletions per base, ~3.46
    highways per alignment (README.md:70-76). That file cannot be fetched
    here, so this generator reproduces the PROFILE: per-base independent
    substitutions to one of the three OTHER bases (the published fraction
    is measured from alignments, so it counts realized substitutions) and
    per-base indels at the published rates, applied sequentially to the
    evolving text like the WFA-style generator above.
    """
    rng = np.random.default_rng(seed)
    N = num_reads
    if length_range is not None:
        lo, hi = length_range
        if not 1 <= lo <= hi:
            raise ValueError(f"bad length_range {length_range}")
        lens = rng.integers(lo, hi + 1, size=N).astype(np.int32)
        length = hi
    else:
        lens = np.full(N, length, dtype=np.int32)
    pattern = rng.integers(0, 4, size=(N, length), dtype=np.int8)
    if length_range is not None:
        pattern[np.arange(length)[None, :] >= lens[:, None]] = 0

    # realized substitutions: flip to one of the other three bases
    mis = rng.random((N, length)) < mismatch_frac
    delta = rng.integers(1, 4, size=(N, length), dtype=np.int8)
    text_base = np.where(mis, (pattern + delta) % 4, pattern).astype(np.int8)

    n_ins = rng.binomial(lens, insert_frac).astype(np.int32)
    n_del = rng.binomial(lens, delete_frac).astype(np.int32)
    max_ev = int(max((n_ins + n_del).max(initial=0), 0))
    Wt = length + (int(n_ins.max(initial=0)) if N else 0)
    text = np.full((N, max(Wt, length)), 0, dtype=np.int8)
    text[:, :length] = text_base
    tlen = lens.copy()
    Wt = text.shape[1]
    cols = np.arange(Wt, dtype=np.int32)[None, :]
    for step in range(max_ev):
        do_ins = step < n_ins
        do_del = (step >= n_ins) & (step < n_ins + n_del)
        live = do_ins | do_del
        pos = (rng.random(N) * tlen).astype(np.int32)
        base = rng.integers(0, 4, size=N, dtype=np.int8)
        posc = pos[:, None]
        gather = np.where(
            (do_del & live)[:, None],
            cols + (cols >= posc),
            np.where((do_ins & live)[:, None], cols - (cols > posc), cols),
        )
        np.clip(gather, 0, Wt - 1, out=gather)
        text = np.take_along_axis(text, gather, axis=1)
        rows = np.nonzero(do_ins)[0]
        text[rows, pos[rows]] = base[rows]
        tlen = tlen + live * (do_ins.astype(np.int32) - do_del.astype(np.int32))

    read_codes = np.full((N, max_len), pad_read, dtype=np.int8)
    m = min(length, max_len)
    read_codes[:, :m] = pattern[:, :m]
    read_len = np.minimum(lens, max_len).astype(np.int32)
    rmask = np.arange(max_len)[None, :] >= read_len[:, None]
    read_codes[rmask] = pad_read
    ref_codes = np.full((N, max_len), pad_ref, dtype=np.int8)
    w = min(Wt, max_len)
    ref_codes[:, :w] = text[:, :w]
    mask = np.arange(max_len)[None, :] >= np.minimum(tlen, max_len)[:, None]
    ref_codes[mask] = pad_ref
    ref_len = np.minimum(tlen, max_len).astype(np.int32)
    return read_codes, read_len, ref_codes, ref_len


def dataset_filename(
    num_reads: int, length: int, error_rate: float, exact: bool = True
) -> str:
    """Reference naming convention (benchmark_dataset.h:242-253)."""
    suffix = "eq" if exact else "lt_eq"
    return f"simulated_{num_reads}_{length}_{error_rate:.6f}_{suffix}.seq"
