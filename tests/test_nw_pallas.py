"""Pallas NW wavefront conformance vs the XLA path (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from asm_tpu.data.generator import generate_dataset_arrays
from asm_tpu.kernels.nw import nw_penalty
from asm_tpu.kernels.nw_pallas import nw_penalty_pallas


@pytest.mark.parametrize("x,o,e", [(1, 1, 1), (2, 3, 1)])
def test_nw_pallas_matches_xla(x, o, e):
    corpus = generate_dataset_arrays(64, 100, 0.15, 0.8, seed=3)
    a = [jnp.asarray(v) for v in corpus]
    ref = nw_penalty(*a, x=x, o=o, e=e)
    got = nw_penalty_pallas(*a, x=x, o=o, e=e, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_nw_pallas_length_extremes():
    import numpy as np
    from asm_tpu.encoding import encode_batch

    reads = ["A", "ACGT" * 32, "ACGTACGT", ""]
    refs = ["ACGT" * 32, "A", "ACGTACGT", "ACG"]
    rc, rl, fc, fl = encode_batch(reads, refs, 128)
    a = [jnp.asarray(v) for v in (rc, rl, fc, fl)]
    ref = nw_penalty(*a)
    got = nw_penalty_pallas(*a, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("x,o,e", [(1, 1, 1), (2, 3, 1)])
def test_nw_trace_pallas_matches_xla(x, o, e):
    from asm_tpu.kernels.nw import nw_align
    from asm_tpu.kernels.nw_pallas import nw_align_pallas

    corpus = generate_dataset_arrays(64, 100, 0.15, 0.8, seed=3)
    a = [jnp.asarray(v) for v in corpus]
    pen, ops, mask = nw_align(*a, x=x, o=o, e=e, match_mask_threshold=3)
    pen2, ops2, mask2 = nw_align_pallas(
        *a, x=x, o=o, e=e, match_mask_threshold=3, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(pen2), np.asarray(pen))
    np.testing.assert_array_equal(np.asarray(ops2), np.asarray(ops))
    np.testing.assert_array_equal(np.asarray(mask2), np.asarray(mask))


def test_nw_trace_pallas_no_mask_and_extremes():
    from asm_tpu.encoding import encode_batch
    from asm_tpu.kernels.nw import nw_align
    from asm_tpu.kernels.nw_pallas import nw_align_pallas

    reads = ["A", "ACGT" * 32, "ACGTACGT", ""]
    refs = ["ACGT" * 32, "A", "ACGTACGT", "ACG"]
    a = [jnp.asarray(v) for v in encode_batch(reads, refs, 128)]
    pen, ops = nw_align(*a)
    pen2, ops2 = nw_align_pallas(*a, interpret=True)
    np.testing.assert_array_equal(np.asarray(pen2), np.asarray(pen))
    np.testing.assert_array_equal(np.asarray(ops2), np.asarray(ops))
