"""SHD pre-filter behavior + metrics (coverage, numLeaps) unit tests."""

import numpy as np
import jax.numpy as jnp

from asm_tpu.kernels.shd import shd_filter
from asm_tpu.encoding import encode_batch
from asm_tpu.data.generator import generate_dataset
from asm_tpu.metrics.coverage import (
    long_consecutive_matching_substring,
    covers,
    check_coverage,
)
from asm_tpu.metrics.numleaps import num_leaps, num_leaps_aligned


def _run(reads, refs, e=3):
    rc, rl, fc, fl = encode_batch(reads, refs, 128)
    return np.asarray(
        shd_filter(jnp.asarray(rc), jnp.asarray(rl), jnp.asarray(fc),
                   jnp.asarray(fl), max_error=e)
    )


def test_shd_accepts_close_pairs(rng):
    """No false rejections on pairs within the error budget (the filter's
    contract, SHD.cpp:157-243: a reject must imply ED > max_error)."""
    reads, refs = generate_dataset(64, 100, 0.02, 0.96, seed=5)  # ~2 errors
    keep = _run(reads, refs, e=3)
    assert keep.all()


def test_shd_accepts_identical():
    keep = _run(["ACGT" * 25], ["ACGT" * 25])
    assert keep.all()


def test_shd_rejects_unrelated(rng):
    """Random unrelated pairs must be overwhelmingly rejected — the whole
    point of the pre-filter (LEAP_SIMD/main.cpp pass-rate accounting)."""
    r1, _ = generate_dataset(64, 100, 0.0, seed=1)
    r2, _ = generate_dataset(64, 100, 0.0, seed=2)
    keep = _run(r1, r2, e=3)
    assert keep.mean() < 0.1


def test_shd_shifted_pair_passes():
    """A single indel shifts the tail; one of the +-k shifts re-aligns it."""
    base = "ACGTTGCAACGGTCATCGAATTGCCAGTGCAACGGTAA" * 2
    read = base
    ref = base[:20] + base[21:]  # one deletion
    keep = _run([read], [ref], e=2)
    assert keep.all()


# ---- metrics ------------------------------------------------------------

def test_lcm_extraction_ops():
    # cf. benchmark_coverage.h:40-63 op handling
    s1 = "AAAACCCCGGGG"
    cigar = "4=1X3=1I3="
    lcm = long_consecutive_matching_substring(s1, "x", cigar, 3)
    assert lcm == "AAAA" + "CCC" + "GGG"
    # runs below threshold are dropped
    lcm2 = long_consecutive_matching_substring(s1, "x", cigar, 4)
    assert lcm2 == "AAAA"


def test_lcm_m_runs_count_without_verification():
    # greedy 'M' merges matches AND mismatches (benchmark_coverage.h:51-60)
    lcm = long_consecutive_matching_substring("ABCDEF", "x", "6M", 3)
    assert lcm == "ABCDEF"


def test_covers():
    assert covers("ABCDEF", "ACE")
    assert covers("ABCDEF", "")
    assert not covers("ACE", "ABCDEF")
    assert not covers("ABC", "CBA")


def test_check_coverage_roundtrip():
    s1 = "AAAACCCC"
    assert check_coverage(s1, s1, "8M", "8=", 1, 3)


def test_num_leaps():
    assert num_leaps("10M") == 0
    assert num_leaps("5M1I4M2D1M") == 2
    assert num_leaps_aligned("AB--C", "A-BCD") == 2
    # prototype semantics: counts '-' run STARTS in both strings
    assert num_leaps_aligned("--A--", "BBBBB") == 2
