"""Pallas LEAP kernel conformance vs the XLA reference path (interpret)."""

import numpy as np
import jax.numpy as jnp
import pytest

from asm_tpu.config import AlignConfig, LeapMode
from asm_tpu.data.generator import generate_dataset_arrays
from asm_tpu.kernels.leap import leap_align
from asm_tpu.kernels.leap_pallas import leap_align_pallas


def _compare(corpus, cfg):
    a = [jnp.asarray(v) for v in corpus]
    ref = leap_align(*a, cfg)
    got = leap_align_pallas(*a, cfg, interpret=True)
    for key in ("passed", "penalty", "lane_shift"):
        np.testing.assert_array_equal(
            np.asarray(got[key]), np.asarray(ref[key]), err_msg=key
        )


@pytest.mark.parametrize("err", [0.05, 0.2])
def test_leap_pallas_matches_xla(err):
    cfg = AlignConfig(leap_af_threshold=60)
    _compare(generate_dataset_arrays(48, 100, err, 0.96,
                                     seed=int(err * 100)), cfg)


def test_leap_pallas_affine():
    cfg = AlignConfig(x=2, o=3, e=1, leap_af_threshold=60)
    _compare(generate_dataset_arrays(32, 80, 0.1, 0.7, seed=5), cfg)


def test_leap_pallas_local_mode():
    cfg = AlignConfig(k=2, leap_mode=LeapMode.LOCAL, leap_af_threshold=40)
    _compare(generate_dataset_arrays(24, 60, 0.15, 0.9, seed=7), cfg)


def test_leap_pallas_tight_threshold():
    cfg = AlignConfig(leap_af_threshold=2)
    _compare(generate_dataset_arrays(16, 100, 0.2, 0.96, seed=9), cfg)


def test_leap_pallas_pre_staged_matches_batch_major():
    """The shared pre-staged corpus layout (stage_swar_t) must be
    bit-identical to the [B, L] int8 path, including _TILE padding."""
    from asm_tpu.kernels.greedy_pallas import stage_swar_t

    cfg = AlignConfig(leap_af_threshold=60)
    rc, rl, fc, fl = generate_dataset_arrays(200, 100, 0.15, 0.8, seed=11)
    a = [jnp.asarray(v) for v in (rc, rl, fc, fl)]
    ref = leap_align_pallas(*a, cfg, interpret=True)
    got = leap_align_pallas(
        jnp.asarray(stage_swar_t(rc)), a[1],
        jnp.asarray(stage_swar_t(fc)), a[3],
        cfg, interpret=True, pre_staged=True,
    )
    for key in ("passed", "penalty", "lane_shift"):
        np.testing.assert_array_equal(
            np.asarray(got[key]), np.asarray(ref[key]), err_msg=key
        )


def test_leap_pallas_planes_pre_staged_matches_batch_major():
    """The 2-bit-plane pre-staged layout (stage_planes_t) must be
    bit-identical to the [B, L] int8 path, including _TILE padding."""
    from asm_tpu.kernels.greedy_pallas import stage_planes_t

    cfg = AlignConfig(leap_af_threshold=60)
    rc, rl, fc, fl = generate_dataset_arrays(200, 100, 0.15, 0.8, seed=11)
    a = [jnp.asarray(v) for v in (rc, rl, fc, fl)]
    ref = leap_align_pallas(*a, cfg, interpret=True)
    got = leap_align_pallas(
        jnp.asarray(stage_planes_t(rc)), a[1],
        jnp.asarray(stage_planes_t(fc)), a[3],
        cfg, interpret=True, pre_staged="planes",
    )
    for key in ("passed", "penalty", "lane_shift"):
        np.testing.assert_array_equal(
            np.asarray(got[key]), np.asarray(ref[key]), err_msg=key
        )


ALL_MODES = [LeapMode.LOCAL, LeapMode.GLOBAL,
             LeapMode.SEMI_FREE_BEGIN, LeapMode.SEMI_FREE_END]


@pytest.mark.parametrize("mode", ALL_MODES)
@pytest.mark.parametrize("affine", [False, True])
def test_leap_pallas_every_mode(mode, affine):
    """Pallas == XLA for every LeapMode the XLA path supports (LV_BAG.h:38
    ED_modes), unit and affine penalties — SEMI_FREE_BEGIN/END included
    (their init rows / convergence arbitration differ from GLOBAL)."""
    if affine:
        cfg = AlignConfig(x=2, o=3, e=1, k=3, leap_af_threshold=40,
                          leap_mode=mode)
    else:
        cfg = AlignConfig(k=3, leap_af_threshold=24, leap_mode=mode)
    _compare(
        generate_dataset_arrays(32, 80, 0.15, 0.8,
                                seed=21 + 2 * int(mode) + int(affine)),
        cfg,
    )


@pytest.mark.parametrize("mode", ALL_MODES)
@pytest.mark.parametrize("sem", ["simd_ed_lev", "simd_ed_affine"])
def test_leap_pallas_simd_ed_every_mode(sem, mode):
    """SIMD_ED semantics across all four ED modes (SIMD_ED.cpp:349-352
    mode corrections): pallas == XLA bit-for-bit."""
    if sem == "simd_ed_lev":
        cfg = AlignConfig(x=1, o=1, e=1, k=3, leap_af_threshold=3,
                          leap_mode=mode)
    else:
        cfg = AlignConfig(x=2, o=3, e=1, k=3, leap_af_threshold=30,
                          leap_mode=mode)
    rc, rl, fc, fl = generate_dataset_arrays(24, 80, 0.1, 0.9,
                                             seed=31 + int(mode))
    a = [jnp.asarray(v) for v in (rc, rl, fc, fl)]
    from asm_tpu.kernels.leap import leap_align as _xla

    ref = _xla(*a, cfg, semantics=sem)
    got = leap_align_pallas(*a, cfg, interpret=True, semantics=sem)
    for key in ("passed", "penalty", "lane_shift"):
        np.testing.assert_array_equal(
            np.asarray(got[key]), np.asarray(ref[key]), err_msg=key
        )


def test_leap_pallas_tile_param_bit_equal():
    """The `tile` static arg (smaller grid tiles for high-energy CIGAR
    passes) must not change any output."""
    cfg = AlignConfig(leap_af_threshold=40)
    rc, rl, fc, fl = generate_dataset_arrays(300, 100, 0.15, 0.8, seed=13)
    a = [jnp.asarray(v) for v in (rc, rl, fc, fl)]
    ref = leap_align_pallas(*a, cfg, interpret=True)
    got = leap_align_pallas(*a, cfg, interpret=True, tile=512)
    for key in ("passed", "penalty", "lane_shift"):
        np.testing.assert_array_equal(
            np.asarray(got[key]), np.asarray(ref[key]), err_msg=key
        )


def test_leap_pallas_tiled_staged_subtile():
    """planes_tiled input staged at one tile size consumed by a kernel
    running a SMALLER grid tile (each grid step reads a T-slice of a
    staged block) — the path leap_cigar_auto uses on the production
    corpus layout."""
    from asm_tpu.kernels.greedy_pallas import _TILE, stage_planes_tiled_t

    cfg = AlignConfig(leap_af_threshold=40)
    B = _TILE  # one staged block
    rc, rl, fc, fl = generate_dataset_arrays(B, 100, 0.15, 0.8, seed=14)
    a = [jnp.asarray(v) for v in (rc, rl, fc, fl)]
    ref = leap_align_pallas(*a, cfg, interpret=True)
    got = leap_align_pallas(
        jnp.asarray(stage_planes_tiled_t(rc)), a[1],
        jnp.asarray(stage_planes_tiled_t(fc)), a[3],
        cfg, interpret=True, pre_staged="planes_tiled", tile=_TILE // 4,
    )
    for key in ("passed", "penalty", "lane_shift"):
        np.testing.assert_array_equal(
            np.asarray(got[key]), np.asarray(ref[key]), err_msg=key
        )


def test_stage_planes_tiled_custom_tile():
    """stage_planes_tiled_t(tile=...) (the tile-matched restaging the
    high-energy CIGAR headline uses) must be bit-equal to the [B, L]
    path when the kernel runs that same grid tile."""
    from asm_tpu.kernels.greedy_pallas import stage_planes_tiled_t

    cfg = AlignConfig(leap_af_threshold=40)
    rc, rl, fc, fl = generate_dataset_arrays(3000, 100, 0.15, 0.8,
                                             seed=19)
    a = [jnp.asarray(v) for v in (rc, rl, fc, fl)]
    ref = leap_align_pallas(*a, cfg, interpret=True)
    got = leap_align_pallas(
        jnp.asarray(stage_planes_tiled_t(rc, tile=1024)), a[1],
        jnp.asarray(stage_planes_tiled_t(fc, tile=1024)), a[3],
        cfg, interpret=True, pre_staged="planes_tiled", tile=1024,
    )
    for key in ("passed", "penalty", "lane_shift"):
        np.testing.assert_array_equal(
            np.asarray(got[key]), np.asarray(ref[key]), err_msg=key
        )
