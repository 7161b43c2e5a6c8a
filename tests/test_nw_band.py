"""Banded NW kernel + certificate cascade vs the exact XLA oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from asm_tpu.data.generator import generate_dataset_arrays
from asm_tpu.encoding import encode_batch
from asm_tpu.kernels.nw import nw_penalty
from asm_tpu.kernels.nw_band import (
    band_certified,
    nw_penalty_auto,
    nw_penalty_banded,
)


@pytest.mark.parametrize("err,mr", [(0.05, 0.96), (0.15, 0.96), (0.4, 0.5)])
def test_certified_banded_equals_full(err, mr):
    corpus = generate_dataset_arrays(600, 100, err, mr, seed=11)
    a = [jnp.asarray(v) for v in corpus]
    ref = np.asarray(nw_penalty(*a))
    for bw in (32, 64):
        pen = np.asarray(nw_penalty_banded(*a, bw=bw, interpret=True))
        ok = np.asarray(band_certified(jnp.asarray(pen), bw))
        assert (pen[ok] == ref[ok]).all(), (bw, err)


@pytest.mark.parametrize("err,mr", [(0.05, 0.96), (0.20, 0.96), (0.4, 0.5)])
def test_auto_cascade_bit_equal(err, mr):
    corpus = generate_dataset_arrays(600, 100, err, mr, seed=12)
    ref = np.asarray(nw_penalty(*[jnp.asarray(v) for v in corpus]))
    auto = nw_penalty_auto(*corpus, interpret=True)
    np.testing.assert_array_equal(auto, ref)


def test_auto_nonunit_penalties_and_edges():
    reads = ["A", "ACGT" * 32, "ACGTACGT", "", "ACGT" * 25, "AC"]
    refs = ["ACGT" * 32, "A", "ACGTACGT", "ACG", "ACGT" * 25, "TGCA" * 20]
    c = encode_batch(reads, refs, 128)
    for x, o, e in [(1, 1, 1), (2, 3, 1), (1, 4, 2)]:
        ref = np.asarray(
            nw_penalty(*[jnp.asarray(v) for v in c], x=x, o=o, e=e)
        )
        auto = nw_penalty_auto(*c, x=x, o=o, e=e, interpret=True)
        np.testing.assert_array_equal(auto, ref, err_msg=f"{x},{o},{e}")


@pytest.mark.parametrize("err,mr", [(0.05, 0.96), (0.4, 0.5)])
def test_auto_pre_staged_planes_bit_equal(err, mr):
    """The production corpus layout (stage_planes_t 2-bit planes) through
    the cascade — including the cold full-kernel branch, whose codes are
    reconstructed from planes (err=0.4 exercises it) — equals both the
    codes path and the exact oracle bit for bit."""
    from asm_tpu.kernels.greedy_pallas import stage_planes_t

    rc, rl, fc, fl = generate_dataset_arrays(600, 100, err, mr, seed=13)
    ref = np.asarray(nw_penalty(*map(jnp.asarray, (rc, rl, fc, fl))))
    auto = nw_penalty_auto(
        jnp.asarray(stage_planes_t(rc)), jnp.asarray(rl),
        jnp.asarray(stage_planes_t(fc)), jnp.asarray(fl),
        interpret=True, pre_staged=True,
    )
    np.testing.assert_array_equal(np.asarray(auto), ref)


def _mixed_corpus(seed=70):
    """Pairs whose certifying bands span 16/32/64/full — errs 0.02-0.20
    plus a pathological indel-heavy block that defeats every band."""
    blocks = [
        generate_dataset_arrays(24, 100, 0.02, 0.96, seed=seed),
        generate_dataset_arrays(24, 100, 0.10, 0.96, seed=seed + 1),
        generate_dataset_arrays(24, 100, 0.20, 0.96, seed=seed + 2),
        generate_dataset_arrays(16, 100, 0.45, 0.10, seed=seed + 3),
    ]
    return [np.concatenate([b[i] for b in blocks]) for i in range(4)]


def test_partitioned_bit_equal_mixed():
    """Host-side band partitioning == the exact oracle on a corpus mixing
    every certifying band, with and without a precomputed band schedule
    (the measured-band cache path)."""
    from asm_tpu.kernels.nw_band import (nw_penalty_partitioned,
                                         required_band)

    corpus = _mixed_corpus()
    a = [jnp.asarray(v) for v in corpus]
    want = np.asarray(nw_penalty(*a))

    got = nw_penalty_partitioned(*corpus, interpret=True)
    np.testing.assert_array_equal(got, want)

    bands = required_band(want)
    assert {int(b) for b in np.unique(bands)} >= {16, 64}
    got2 = nw_penalty_partitioned(*corpus, bands=bands, interpret=True)
    np.testing.assert_array_equal(got2, want)


def test_partitioned_stale_bands_self_heal():
    """A too-narrow (stale) band schedule must still return exact
    penalties — uncertified results forward to wider stages."""
    from asm_tpu.kernels.nw_band import nw_penalty_partitioned

    corpus = _mixed_corpus(seed=80)
    a = [jnp.asarray(v) for v in corpus]
    want = np.asarray(nw_penalty(*a))
    stale = np.full(want.shape, 16, np.int32)  # everything claims BW=16
    got = nw_penalty_partitioned(*corpus, bands=stale, interpret=True)
    np.testing.assert_array_equal(got, want)


def test_partitioned_pre_staged_planes():
    from asm_tpu.kernels.greedy_pallas import stage_planes_t
    from asm_tpu.kernels.nw_band import nw_penalty_partitioned

    rc, rl, fc, fl = _mixed_corpus(seed=90)
    a = [jnp.asarray(v) for v in (rc, rl, fc, fl)]
    want = np.asarray(nw_penalty(*a))
    got = nw_penalty_partitioned(
        stage_planes_t(rc), rl, stage_planes_t(fc), fl,
        pre_staged=True, interpret=True,
    )
    np.testing.assert_array_equal(got, want)


def test_partitioned_variable_length():
    """Band partitioning on a variable-length corpus (the generator's
    length_range mode) — destinations off the main diagonal exercise
    the |m-n| band interaction."""
    from asm_tpu.kernels.nw_band import nw_penalty_partitioned

    corpus = generate_dataset_arrays(96, 100, 0.12, 0.8, seed=95,
                                     length_range=(40, 120))
    a = [jnp.asarray(v) for v in corpus]
    want = np.asarray(nw_penalty(*a))
    got = nw_penalty_partitioned(*corpus, interpret=True)
    np.testing.assert_array_equal(got, want)


def test_bw8_stage_and_partition():
    """BW=8 (16 pairs per register row) joins the band set: certified
    pairs (pen < o + 3e) are exact; the partitioned driver with the
    extended stage list stays bit-equal on a mixed corpus."""
    from asm_tpu.kernels.nw_band import (band_certified,
                                         nw_penalty_banded,
                                         nw_penalty_partitioned,
                                         required_band)

    corpus = _mixed_corpus(seed=99)
    a = [jnp.asarray(v) for v in corpus]
    want = np.asarray(nw_penalty(*a))
    p8 = np.asarray(nw_penalty_banded(*a, bw=8, interpret=True))
    c8 = np.asarray(band_certified(p8, 8))
    assert 0 < c8.sum() < len(c8)  # mixed: some certify, some do not
    np.testing.assert_array_equal(p8[c8], want[c8])
    got = nw_penalty_partitioned(*corpus, bws=(8, 16, 32, 64),
                                 interpret=True)
    np.testing.assert_array_equal(got, want)
    bands = required_band(want, bws=(8, 16, 32, 64))
    got2 = nw_penalty_partitioned(*corpus, bws=(8, 16, 32, 64),
                                  bands=bands, interpret=True)
    np.testing.assert_array_equal(got2, want)


def test_dispatch_plan_execute_bit_equal():
    """The SHARED production dispatch (nw_dispatch plan/execute — what
    the harness sweep and the headline tool both time) is bit-equal to
    the exact kernel on a mixed-difficulty corpus, in both layouts."""
    from asm_tpu.kernels.greedy_pallas import stage_planes_t
    from asm_tpu.kernels.nw_band import required_band
    from asm_tpu.kernels.nw_dispatch import (nw_partition_execute,
                                             nw_partition_plan)

    easy = generate_dataset_arrays(300, 100, 0.05, 0.96, seed=31)
    hard = generate_dataset_arrays(212, 100, 0.4, 0.5, seed=32)
    corpus = tuple(np.concatenate([a, b]) for a, b in zip(easy, hard))
    ref = np.asarray(nw_penalty(*map(jnp.asarray, corpus)))
    bands = required_band(ref, bws=(8, 16, 32, 64))

    plan = nw_partition_plan(*corpus, bands, max_chunk=128,
                             interpret=True)
    assert len(plan.chunks) > 1  # multiple partitions/chunks exercised
    pen = nw_partition_execute(plan)
    assert np.array_equal(pen, ref)

    rc, rl, fc, fl = corpus
    plan2 = nw_partition_plan(stage_planes_t(rc), rl, stage_planes_t(fc),
                              fl, bands, max_chunk=256, pre_staged=True,
                              interpret=True)
    assert np.array_equal(nw_partition_execute(plan2), ref)


def test_dispatch_bad_bands_fail_certificate():
    """A too-narrow band assignment must FAIL the in-run certificate
    loudly (the self-heal signal the artifact tools key on), never
    return an uncertified penalty."""
    from asm_tpu.kernels.nw_dispatch import (nw_partition_execute,
                                             nw_partition_plan)

    corpus = generate_dataset_arrays(64, 100, 0.4, 0.5, seed=33)
    bands = np.full(64, 8, np.int32)  # deliberately too narrow
    plan = nw_partition_plan(*corpus, bands, interpret=True)
    with pytest.raises(ValueError, match="certificate"):
        nw_partition_execute(plan)
