"""P7/P8 prototype emulators vs the pymatch ORIGINALS as oracles.

The originals (pymatch/algorithms/greedy.py, greedyShortsighted.py) are
imported straight from /root/reference with a one-function `gmpy` shim
(scan0/scan1 on Python ints — the only gmpy API pymatch touches) and a
stub for matplotlib-free environments. If the reference tree is absent,
the emulators are still smoke-tested against pinned values.
"""

import sys
import types

import numpy as np
import pytest

from asm_tpu.data.generator import generate_dataset
from asm_tpu.reference_impl.gasma_proto_ref import (
    GasmaV1Ref,
    GasmaShortsightedRef,
)

REF = "/root/reference"


def _scan_shim():
    """gmpy.scan0/scan1 for non-negative Python ints (first 0/1 bit)."""
    g = types.ModuleType("gmpy")

    def scan1(x, start=0):
        x >>= start
        if x == 0:
            return -1
        return (x & -x).bit_length() - 1 + start

    def scan0(x, start=0):
        x >>= start
        return (~x & (x + 1)).bit_length() - 1 + start

    g.scan0 = scan0
    g.scan1 = scan1
    return g


@pytest.fixture(scope="module")
def originals():
    import os

    if not os.path.isdir(REF):
        pytest.skip("reference tree not mounted")
    sys.modules.setdefault("gmpy", _scan_shim())
    saved = list(sys.path)
    sys.path.insert(0, REF)
    sys.path.insert(0, REF + "/pymatch")  # greedyShortsighted imports
    try:                                  # `algorithms.NeedlemanWunsch`
        from pymatch.algorithms import GASMA, GASMAShortsighted
    finally:
        sys.path[:] = saved
    return GASMA, GASMAShortsighted


def _corpus(err, mr, seed, n=24):
    return generate_dataset(n, 60, err, mr, seed=seed)


@pytest.mark.parametrize("err,mr,seed", [
    (0.05, 0.96, 41), (0.10, 0.96, 42), (0.10, 0.5, 43),
])
def test_gasma_v1_matches_original(originals, err, mr, seed):
    GASMA, _ = originals
    reads, refs = _corpus(err, mr, seed)
    for a, b in zip(reads, refs):
        want = GASMA(a, b, 7, threshold=3, crossHurdleThreshold=1
                     ).editDistance()
        got = GasmaV1Ref(a, b, 7, threshold=3,
                         cross_hurdle_threshold=1).edit_distance()
        assert got == want, (a, b, got, want)


@pytest.mark.parametrize("err,mr,seed", [
    (0.05, 0.96, 44), (0.10, 0.96, 45), (0.10, 0.5, 46),
])
def test_gasma_shortsighted_matches_original(originals, err, mr, seed):
    _, GASMAShortsighted = originals
    reads, refs = _corpus(err, mr, seed, n=12)
    for a, b in zip(reads, refs):
        want, _route = GASMAShortsighted(
            a, b, 2, threshold=3, crossHurdleThreshold=1, sight=3
        ).editDistance()
        got = GasmaShortsightedRef(
            a, b, 2, threshold=3, cross_hurdle_threshold=1, sight=3
        ).edit_distance()
        assert got == want, (a, b, got, want)


def test_v1_demo_pair_smoke():
    """The original's __main__ demo pair (greedy.py:197-199) must produce
    a small plausible cost on our emulator even without the oracle."""
    a = ("TCGATTCGCCCTCACTCAGAACGAGGGGCTTCCCCAATGGCAGGCTCGATGACCATAGGGG"
         "CTTTCTTAGGGGAATTGCTGAATCCTCTGTGATCTACTC")
    b = ("TCGATTCCCTCACTCAGAACGAGGGCTTCCCCTAGCAGGGCTCGATGACCATTAGGGGCTT"
         "TCTTATGCGGGAATTGCTGCAATCTTGTGATGCTACTC")
    cost = GasmaV1Ref(a, b, 7, threshold=3,
                      cross_hurdle_threshold=0).edit_distance()
    assert 0 < cost < 60


# ---- P6: generalized LEAP with pluggable hooks --------------------------

def _rand_pairs(rng, n, length):
    bases = "ACGT"
    return [
        ("".join(rng.choice(list(bases), length)),
         "".join(rng.choice(list(bases), length)))
        for _ in range(n)
    ]


def test_leap_generalized_matches_original_on_working_domain(originals):
    """The original prototype (LEAP.py) crashes with IndexError whenever a
    match run reaches 6 (unwrapped de Bruijn index, LEAP.py:112-116); on
    inputs where it runs, our exact-scan emulator must agree."""
    import contextlib
    import io

    sys.path.insert(0, REF)
    sys.path.insert(0, REF + "/pymatch")
    try:
        from pymatch.algorithms.LEAP import LEAP
    finally:
        sys.path.remove(REF)
        sys.path.remove(REF + "/pymatch")
    from asm_tpu.reference_impl.leap_proto_ref import LeapGeneralizedRef

    rng = np.random.default_rng(7)
    compared = crashed = 0
    unit_leap = lambda l_, l: 1  # custom pluggable penalty
    for a, b in _rand_pairs(rng, 40, 12):
        for pen in (None, unit_leap):
            try:
                with contextlib.redirect_stdout(io.StringIO()):
                    orig = LEAP(a, b, 2, 14, penalty=pen)
                    want = orig.editDistance()
                    want_state = (orig.finalLane, orig.finalEnergy)
            except IndexError:
                crashed += 1
                continue
            ours = LeapGeneralizedRef(a, b, 2, 14, penalty=pen)
            got = ours.edit_distance()
            assert got == want, (a, b, pen)
            if want:
                assert (ours.final_lane, ours.final_energy) == want_state, \
                    (a, b, pen)
            compared += 1
    assert compared >= 30, f"too few comparable pairs ({compared})"


def test_leap_generalized_demo_pair(originals):
    """The original's __main__ demo (LEAP.py:189-194)."""
    from asm_tpu.reference_impl.leap_proto_ref import LeapGeneralizedRef

    p = LeapGeneralizedRef("ACTAGAACTT", "ACTTAGCACT", 2, 10)
    assert p.edit_distance()
    assert (p.final_lane, p.final_energy) == (0, 5)


def test_leap_generalized_survives_long_runs():
    """Where the original raises IndexError, the emulator still runs —
    the documented fix of the unwrapped de Bruijn quirk."""
    from asm_tpu.reference_impl.leap_proto_ref import LeapGeneralizedRef

    p = LeapGeneralizedRef("ACGTACGTAA", "ACGTACGTTA", 2, 20)
    assert p.edit_distance()  # one mismatch, clean-lane crawl converges


def test_leap_generalized_multi_origin_destination():
    from asm_tpu.reference_impl.leap_proto_ref import LeapGeneralizedRef

    a, b = "ACGTTGCA", "CGTTGCAA"
    # free choice of starting/ending lane (the prototype's multi-origin
    # form, LEAP.py:34-38)
    p = LeapGeneralizedRef(
        a, b, 2, 20,
        origin_lanes={-1: 0, 0: 0, 1: 0},
        destination_lanes={-1: len(a), 0: len(a), 1: len(a)},
    )
    q = LeapGeneralizedRef(a, b, 2, 20)
    assert p.edit_distance() and q.edit_distance()
    assert p.final_energy <= q.final_energy
