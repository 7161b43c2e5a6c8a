"""Fused LEAP backtrack/CIGAR kernel == XLA history path, bit for bit.

leap_align_pallas(want_cigar=True) runs LV::backtrack inside the kernel
(VMEM-parked energy history + downward level sweep); its decoded edit
lists and CIGAR strings must equal leap_backtrack_batch over
leap_align(want_history=True) exactly — same ops, same id_lengths, same
is_open flags, same terminal runs — for every mode and penalty shape.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from asm_tpu.config import AlignConfig, LeapMode
from asm_tpu.data.generator import generate_dataset
from asm_tpu.encoding import encode_batch
from asm_tpu.kernels.leap import leap_align
from asm_tpu.kernels.leap_backtrack import leap_backtrack_batch
from asm_tpu.kernels.leap_pallas import leap_align_pallas, leap_cigar_decode


@pytest.mark.parametrize("err,mr,seed,cfg", [
    # the benchmark's unit-cost GLOBAL config
    (0.05, 0.96, 50,
     AlignConfig(x=1, o=1, e=1, k=3, leap_af_threshold=24, max_len=128)),
    # affine penalties: exercises gap-open vs gap-extend chain replay
    (0.10, 0.96, 51,
     AlignConfig(x=2, o=3, e=1, k=3, leap_af_threshold=30, max_len=128)),
    # indel-heavy, wider band: long I/D chains + lane corrections
    (0.20, 0.50, 52,
     AlignConfig(x=2, o=3, e=1, k=4, leap_af_threshold=36, max_len=128)),
    # LOCAL mode: no lane-correction prefix
    (0.10, 0.96, 53,
     AlignConfig(x=1, o=1, e=1, k=3, leap_af_threshold=24, max_len=128,
                 leap_mode=LeapMode.LOCAL)),
    # SEMI_FREE_BEGIN: free-begin init rows + corrected-energy arbitration
    # with the lane-correction prefix in the decode
    (0.10, 0.80, 54,
     AlignConfig(x=2, o=3, e=1, k=3, leap_af_threshold=30, max_len=128,
                 leap_mode=LeapMode.SEMI_FREE_BEGIN)),
    # SEMI_FREE_END: last-converged-lane pick, no correction prefix
    (0.10, 0.80, 55,
     AlignConfig(x=1, o=1, e=1, k=3, leap_af_threshold=24, max_len=128,
                 leap_mode=LeapMode.SEMI_FREE_END)),
])
def test_fused_cigar_matches_xla_backtrack(err, mr, seed, cfg):
    reads, refs = generate_dataset(48, 100, err, mr, seed=seed)
    rc, rl, fc, fl = map(jnp.asarray, encode_batch(reads, refs, cfg.max_len))
    hist = leap_align(rc, rl, fc, fl, cfg, want_history=True)
    want = leap_backtrack_batch(hist, cfg)
    out = leap_align_pallas(rc, rl, fc, fl, cfg, interpret=True,
                            want_cigar=True)
    np.testing.assert_array_equal(
        np.asarray(out["passed"]), np.asarray(hist["passed"])
    )
    np.testing.assert_array_equal(
        np.asarray(out["penalty"]), np.asarray(hist["penalty"])
    )
    # the caller-side truncation contract
    assert int(
        (np.asarray(out["penalty"]) * np.asarray(out["passed"])).max()
    ) <= cfg.leap_energy_bound
    got = leap_cigar_decode(out, cfg)
    for i, (w, g) in enumerate(zip(want, got)):
        assert w == g, (i, w, g)


def _auto_vs_xla(cfg, corpus, **auto_kw):
    rc, rl, fc, fl = map(jnp.asarray, corpus)
    from asm_tpu.kernels.leap_pallas import leap_cigar_auto

    hist = leap_align(rc, rl, fc, fl, cfg, want_history=True)
    want = leap_backtrack_batch(hist, cfg)
    out = leap_cigar_auto(rc, rl, fc, fl, cfg, interpret=True, **auto_kw)
    np.testing.assert_array_equal(
        np.asarray(out["passed"]), np.asarray(hist["passed"])
    )
    np.testing.assert_array_equal(
        np.asarray(out["penalty"]), np.asarray(hist["penalty"])
    )
    for i, (w, g) in enumerate(zip(want, out["cigars"])):
        assert w == g, (i, w, g)
    return out


def test_cigar_auto_lifts_the_energy_ceiling():
    """The round-3 fused path was hard-capped at E=48; leap_cigar_auto
    must produce bit-equal CIGARs on a corpus whose pairs PASS at
    energies well above that, under the reference benchmark's
    af_threshold=200 (benchmark_utils.h:289)."""
    from asm_tpu.data.generator import generate_dataset_arrays

    cfg = AlignConfig(x=2, o=3, e=1, k=4, leap_af_threshold=200,
                      max_len=128)
    corpus = generate_dataset_arrays(64, 100, 0.30, 0.96, seed=60)
    out = _auto_vs_xla(cfg, corpus)
    pen = np.asarray(out["penalty"]) * np.asarray(out["passed"])
    assert int(pen.max()) > 48, "corpus too easy to prove the lift"
    assert out["energy_bound"] >= int(pen.max())
    assert out["energy_bound"] < 200  # sized by measurement, not af


def test_cigar_auto_easy_corpus_small_bound():
    """On an easy corpus the two-pass bound stays small (one bucket) —
    the record buffer and history shrink with the measured energy."""
    from asm_tpu.data.generator import generate_dataset_arrays

    cfg = AlignConfig(x=1, o=1, e=1, k=3, leap_af_threshold=200,
                      max_len=128)
    corpus = generate_dataset_arrays(48, 100, 0.05, 0.96, seed=61)
    out = _auto_vs_xla(cfg, corpus)
    assert out["energy_bound"] <= 16


def test_cigar_auto_forced_tiny_tile():
    """A tiny vmem budget forces the smallest tile (1024 — the Mosaic
    floor: pair blocks need a sublane dim divisible by 8; the old
    256/512 tiles never actually lowered on hardware); outputs
    unchanged."""
    from asm_tpu.data.generator import generate_dataset_arrays

    cfg = AlignConfig(x=1, o=1, e=1, k=3, leap_af_threshold=60,
                      max_len=128)
    corpus = generate_dataset_arrays(48, 100, 0.15, 0.9, seed=62)
    from asm_tpu.kernels.leap_pallas import (leap_cigar_tile,
                                             leap_cigar_vmem_bytes)
    import dataclasses

    # budget that only fits a 1024-pair tile at this bound
    probe = dataclasses.replace(cfg, leap_max_energy=32)
    b1024 = leap_cigar_vmem_bytes(probe, 1024)
    assert leap_cigar_tile(probe, vmem_budget=b1024) == 1024
    # below the floor: no tile, XLA fallback territory
    assert leap_cigar_tile(probe, vmem_budget=b1024 - 1) is None
    _auto_vs_xla(cfg, corpus, vmem_budget=b1024, bucket=32)


def test_cigar_auto_xla_fallback():
    """When even a 1024-pair tile cannot hold the history the XLA
    full-history path takes over transparently."""
    from asm_tpu.data.generator import generate_dataset_arrays

    cfg = AlignConfig(x=1, o=1, e=1, k=3, leap_af_threshold=30,
                      max_len=128)
    corpus = generate_dataset_arrays(32, 100, 0.15, 0.9, seed=63)
    out = _auto_vs_xla(cfg, corpus, vmem_budget=1024)
    assert "edit_rec" not in out


def test_cigar_auto_planes_tiled_staged():
    """leap_cigar_auto on the production tile-major staged corpus: the
    penalty pass runs at the staged tile, the CIGAR pass may sub-tile
    the same blocks; bit-equal to the [B, L] path."""
    from asm_tpu.data.generator import generate_dataset_arrays
    from asm_tpu.kernels.greedy_pallas import _TILE, stage_planes_tiled_t
    from asm_tpu.kernels.leap_pallas import leap_cigar_auto, leap_cigar_vmem_bytes
    import dataclasses

    cfg = AlignConfig(x=1, o=1, e=1, k=3, leap_af_threshold=60,
                      max_len=128)
    B = _TILE
    rc, rl, fc, fl = generate_dataset_arrays(B, 100, 0.15, 0.9, seed=64)
    want = _auto_vs_xla(cfg, (rc, rl, fc, fl))
    # budget that forces a sub-tile of the staged block: fits the
    # af-capped energy bound (60) at tile 1024 (the Mosaic floor) but
    # not at the staged 2048
    probe = dataclasses.replace(cfg, leap_max_energy=60)
    budget = leap_cigar_vmem_bytes(probe, 1024)
    got = leap_cigar_auto(
        jnp.asarray(stage_planes_tiled_t(rc)), jnp.asarray(rl),
        jnp.asarray(stage_planes_tiled_t(fc)), jnp.asarray(fl),
        cfg, interpret=True, pre_staged="planes_tiled",
        vmem_budget=budget, bucket=32,
    )
    np.testing.assert_array_equal(np.asarray(got["passed"]),
                                  np.asarray(want["passed"]))
    np.testing.assert_array_equal(np.asarray(got["penalty"]),
                                  np.asarray(want["penalty"]))
    assert got["cigars"] == want["cigars"]
