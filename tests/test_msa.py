"""Profile-profile alignment conformance vs the scalar prototype mirror."""

import numpy as np
import jax.numpy as jnp
import pytest

from asm_tpu.kernels.msa import profile_align, profiles_from_alignments
from asm_tpu.reference_impl.msa_ref import profile_align_ref


def _random_alignment(rng, rows, length):
    al = []
    for _ in range(rows):
        al.append("".join(rng.choice(list("ACGT-"), size=length)))
    # ensure no all-gap column (prototype divides by the column sum, which
    # is never 0 since '-' also counts as a symbol — any column works)
    return al


@pytest.mark.parametrize("l1,l2", [(7, 7), (12, 9), (5, 16)])
def test_profile_align_matches_prototype(rng, l1, l2):
    for trial in range(4):
        a1 = _random_alignment(rng, 2, l1)
        a2 = _random_alignment(rng, 3, l2)
        exp_score, D, B = profile_align_ref(a1, a2)
        p1, n1 = profiles_from_alignments([a1], 32)
        p2, n2 = profiles_from_alignments([a2], 32)
        out = profile_align(
            jnp.asarray(p1), jnp.asarray(n1), jnp.asarray(p2), jnp.asarray(n2)
        )
        got = float(np.asarray(out["score"])[0])
        assert got == pytest.approx(exp_score, abs=1e-4), (a1, a2)
        # traceback consumes exactly (l1, l2)
        ops = np.asarray(out["ops"])[0]
        ops = ops[ops != 0]
        i_used = int(((ops == 1) | (ops == 3)).sum())
        j_used = int(((ops == 1) | (ops == 4)).sum())
        assert (i_used, j_used) == (l1, l2)


def test_profile_align_batched(rng):
    als1 = [_random_alignment(rng, 2, 10) for _ in range(6)]
    als2 = [_random_alignment(rng, 2, 11) for _ in range(6)]
    p1, n1 = profiles_from_alignments(als1, 32)
    p2, n2 = profiles_from_alignments(als2, 32)
    out = profile_align(
        jnp.asarray(p1), jnp.asarray(n1), jnp.asarray(p2), jnp.asarray(n2)
    )
    scores = np.asarray(out["score"])
    for b in range(6):
        exp, _, _ = profile_align_ref(als1[b], als2[b])
        assert scores[b] == pytest.approx(exp, abs=1e-4)


def test_prototype_example():
    """The prototype's own __main__ example (MSA.py:103)."""
    a1 = ["ACGT-CA", "AGGTCCA"]
    a2 = ["-A-CTCC", "TAGCTCC"]
    exp, _, _ = profile_align_ref(a1, a2)
    p1, n1 = profiles_from_alignments([a1], 16)
    p2, n2 = profiles_from_alignments([a2], 16)
    out = profile_align(
        jnp.asarray(p1), jnp.asarray(n1), jnp.asarray(p2), jnp.asarray(n2)
    )
    assert float(np.asarray(out["score"])[0]) == pytest.approx(exp, abs=1e-4)
