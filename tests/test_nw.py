"""NW kernel conformance: batched JAX wavefront vs the scalar oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from asm_tpu.encoding import encode_batch
from asm_tpu.kernels.nw import nw_penalty, nw_align
from asm_tpu.ops.cigar import batch_nw_cigars
from asm_tpu.reference_impl.nw_ref import nw_ref
from asm_tpu.data.generator import generate_dataset
from asm_tpu.metrics.coverage import long_consecutive_matching_substring


def _levenshtein(a, b):
    m, n = len(a), len(b)
    d = np.zeros((m + 1, n + 1), dtype=int)
    d[:, 0] = np.arange(m + 1)
    d[0, :] = np.arange(n + 1)
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            d[i, j] = min(
                d[i - 1, j] + 1,
                d[i, j - 1] + 1,
                d[i - 1, j - 1] + (a[i - 1] != b[j - 1]),
            )
    return int(d[m, n])


def test_nw_ref_is_levenshtein_at_unit_costs(rng):
    for _ in range(15):
        reads, refs = generate_dataset(
            1, 30, 0.2, 0.5, seed=int(rng.integers(1 << 30))
        )
        pen, _ = nw_ref(reads[0], refs[0], 1, 1, 1)
        assert pen == _levenshtein(reads[0], refs[0])


def test_nw_ref_cigar_consistency():
    pen, cig = nw_ref("ACGT", "AGGT")
    assert pen == 1
    assert cig == "1=1X2="
    pen, cig = nw_ref("ACGT", "ACT")
    assert pen == 1


@pytest.mark.parametrize("x,o,e", [(1, 1, 1), (1, 3, 1), (2, 3, 2)])
def test_nw_penalty_matches_ref(rng, x, o, e):
    reads, refs = generate_dataset(64, 100, 0.15, 0.8, seed=7)
    rc, rl, fc, fl = encode_batch(reads, refs, 128)
    pen = np.asarray(
        nw_penalty(jnp.asarray(rc), jnp.asarray(rl), jnp.asarray(fc),
                   jnp.asarray(fl), x=x, o=o, e=e)
    )
    for i in range(len(reads)):
        exp, _ = nw_ref(reads[i], refs[i], x, o, e, traceback=False)
        assert pen[i] == exp, f"pair {i}"


def test_nw_align_traceback(rng):
    reads, refs = generate_dataset(32, 80, 0.2, 0.7, seed=11)
    rc, rl, fc, fl = encode_batch(reads, refs, 128)
    pen, ops = nw_align(
        jnp.asarray(rc), jnp.asarray(rl), jnp.asarray(fc), jnp.asarray(fl)
    )
    pen = np.asarray(pen)
    cigars = batch_nw_cigars(np.asarray(ops))
    for i in range(len(reads)):
        exp_pen, exp_cig = nw_ref(reads[i], refs[i])
        assert pen[i] == exp_pen
        # the traceback must be a VALID optimal alignment: verify by
        # replaying the CIGAR
        cost = _replay(reads[i], refs[i], cigars[i])
        assert cost == exp_pen, f"pair {i}: {cigars[i]} vs {exp_cig}"


def _replay(s1, s2, cigar, x=1, o=1, e=1):
    import re

    i1 = i2 = 0
    cost = 0
    for run_s, op in re.findall(r"(\d+)([=XID])", cigar):
        run = int(run_s)
        if op == "=":
            assert s1[i1 : i1 + run] == s2[i2 : i2 + run]
            i1 += run
            i2 += run
        elif op == "X":
            for t in range(run):
                assert s1[i1 + t] != s2[i2 + t]
            cost += x * run
            i1 += run
            i2 += run
        elif op == "I":
            cost += o + (run - 1) * e
            i1 += run
        else:
            cost += o + (run - 1) * e
            i2 += run
    assert i1 == len(s1) and i2 == len(s2)
    return cost


def test_nw_lcm_extraction():
    reads, refs = generate_dataset(4, 60, 0.1, 0.9, seed=3)
    rc, rl, fc, fl = encode_batch(reads, refs, 128)
    _, ops = nw_align(
        jnp.asarray(rc), jnp.asarray(rl), jnp.asarray(fc), jnp.asarray(fl)
    )
    cigars = batch_nw_cigars(np.asarray(ops))
    for i in range(4):
        lcm = long_consecutive_matching_substring(reads[i], refs[i], cigars[i], 3)
        assert len(lcm) <= len(reads[i])
