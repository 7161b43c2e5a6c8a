"""Pallas greedy kernel conformance vs the XLA reference path.

Runs in Pallas interpret mode on the CPU backend — bit-identical outputs
are required (the pallas kernel replays exactly the same float32
heuristics and integer queries as asm_tpu.kernels.greedy)."""

import numpy as np
import jax.numpy as jnp
import pytest

from asm_tpu.config import AlignConfig, AlignmentType
from asm_tpu.data.generator import generate_dataset_arrays
from asm_tpu.kernels.greedy import greedy_align
from asm_tpu.kernels.greedy_pallas import greedy_align_pallas
from asm_tpu.ops.cigar import batch_greedy_cigars


def _compare(corpus, cfg):
    a = [jnp.asarray(v) for v in corpus]
    ref = greedy_align(*a, cfg)
    got = greedy_align_pallas(*a, cfg, interpret=True)
    np.testing.assert_array_equal(np.asarray(got["cost"]),
                                  np.asarray(ref["cost"]))
    np.testing.assert_array_equal(np.asarray(got["steps"]),
                                  np.asarray(ref["steps"]))
    assert batch_greedy_cigars(got) == batch_greedy_cigars(ref)


@pytest.mark.parametrize("atype",
                         [AlignmentType.GLOBAL, AlignmentType.SEMI_GLOBAL])
@pytest.mark.parametrize("err,mr", [(0.05, 0.96), (0.2, 0.96), (0.4, 0.5)])
def test_pallas_matches_xla(err, mr, atype):
    # SEMI_GLOBAL exercises the kernel's non-global constant folds (the
    # first-step sc_pen fold in the peeled iteration)
    cfg = AlignConfig(max_steps=24, alignment_type=atype)
    corpus = generate_dataset_arrays(48, 100, err, mr, seed=int(err * 100))
    _compare(corpus, cfg)


def test_pallas_other_penalties():
    cfg = AlignConfig(x=2, o=3, e=1, k=2, max_steps=24)
    corpus = generate_dataset_arrays(32, 80, 0.1, 0.8, seed=5)
    _compare(corpus, cfg)


@pytest.mark.parametrize("atype",
                         [AlignmentType.GLOBAL, AlignmentType.SEMI_GLOBAL])
@pytest.mark.parametrize("bound", [1, 2])
def test_pallas_tiny_steps_bound(bound, atype):
    # exercises the peeled iteration 0 (kernel): bound=1 runs ONLY the
    # peeled step (the while_loop body never executes), bound=2 runs the
    # peel plus exactly one loop iteration; both must truncate exactly
    # like the XLA path (final leap from the truncated state included).
    # SEMI_GLOBAL pins the peel's lane-switch constant fold
    # (greedy_pallas sc_pen at step 0 is free only in SEMI_GLOBAL).
    cfg = AlignConfig(max_steps=bound, alignment_type=atype)
    corpus = generate_dataset_arrays(32, 100, 0.1, 0.9, seed=17)
    _compare(corpus, cfg)


def test_pallas_want_cigar_false():
    cfg = AlignConfig(max_steps=24)
    corpus = generate_dataset_arrays(16, 100, 0.1, seed=9)
    a = [jnp.asarray(v) for v in corpus]
    ref = greedy_align(*a, cfg)
    got = greedy_align_pallas(*a, cfg, interpret=True, want_cigar=False)
    np.testing.assert_array_equal(np.asarray(got["cost"]),
                                  np.asarray(ref["cost"]))
    assert "cigar_ops" not in got and "step_rec" in got


def test_pallas_pre_staged_matches_batch_major():
    """The production pre-staged layout (stage_swar_t position-major SWAR
    words) must be bit-identical to the [B, L] int8 API path, including
    internal _TILE padding (B=200 is not a multiple of anything)."""
    from asm_tpu.kernels.greedy_pallas import stage_swar_t

    cfg = AlignConfig(max_steps=24)
    rc, rl, fc, fl = generate_dataset_arrays(200, 100, 0.15, 0.8, seed=11)
    a = [jnp.asarray(v) for v in (rc, rl, fc, fl)]
    ref = greedy_align_pallas(*a, cfg, interpret=True)
    got = greedy_align_pallas(
        jnp.asarray(stage_swar_t(rc)), a[1],
        jnp.asarray(stage_swar_t(fc)), a[3],
        cfg, interpret=True, pre_staged=True,
    )
    for key in ("cost", "steps", "cigar_ops", "cigar_runs"):
        np.testing.assert_array_equal(np.asarray(got[key]),
                                      np.asarray(ref[key]))


def test_pallas_planes_pre_staged_matches_batch_major():
    """The 2-bit-plane pre-staged layout (stage_planes_t, 4x denser than
    SWAR) must be bit-identical to the [B, L] int8 API path — the kernel
    consumes host-packed planes directly instead of packing per tile."""
    from asm_tpu.kernels.greedy_pallas import stage_planes_t

    cfg = AlignConfig(max_steps=24)
    rc, rl, fc, fl = generate_dataset_arrays(200, 100, 0.15, 0.8, seed=11)
    a = [jnp.asarray(v) for v in (rc, rl, fc, fl)]
    ref = greedy_align_pallas(*a, cfg, interpret=True)
    got = greedy_align_pallas(
        jnp.asarray(stage_planes_t(rc)), a[1],
        jnp.asarray(stage_planes_t(fc)), a[3],
        cfg, interpret=True, pre_staged="planes",
    )
    for key in ("cost", "steps", "cigar_ops", "cigar_runs"):
        np.testing.assert_array_equal(np.asarray(got[key]),
                                      np.asarray(ref[key]))


def test_pallas_rejects_unsupported_flip_threshold():
    cfg = AlignConfig(flip_threshold=2, max_steps=8)
    corpus = generate_dataset_arrays(8, 50, 0.1, seed=1)
    a = [jnp.asarray(v) for v in corpus]
    with pytest.raises(NotImplementedError):
        greedy_align_pallas(*a, cfg, interpret=True)


def test_pallas_rejects_exact_floats():
    cfg = AlignConfig(exact_floats=True, max_steps=8)
    corpus = generate_dataset_arrays(8, 50, 0.1, seed=1)
    a = [jnp.asarray(v) for v in corpus]
    with pytest.raises(NotImplementedError):
        greedy_align_pallas(*a, cfg, interpret=True)


def test_pallas_pre_staged_lanes_matches_xla():
    """pre_staged='lanes' (host-staged finished hurdle rows, the bench's
    production layout) == the XLA kernel."""
    from asm_tpu.kernels.greedy_pallas import stage_lanes_t

    cfg = AlignConfig(k=3, max_steps=24)
    rc, rl, fc, fl = generate_dataset_arrays(128, 100, 0.15, seed=44,
                                             length_range=(60, 120))
    lanes = stage_lanes_t(rc, rl, fc, fl, cfg.k)
    H = (lanes.shape[0] + 1) // 2
    got = greedy_align_pallas(
        jnp.asarray(lanes[:H]), jnp.asarray(rl),
        jnp.asarray(lanes[H:]), jnp.asarray(fl), cfg,
        interpret=True, pre_staged="lanes",
    )
    ref = greedy_align(*map(jnp.asarray, (rc, rl, fc, fl)), cfg)
    np.testing.assert_array_equal(np.asarray(got["cost"]),
                                  np.asarray(ref["cost"]))
    np.testing.assert_array_equal(np.asarray(got["steps"]),
                                  np.asarray(ref["steps"]))
    assert batch_greedy_cigars(got) == batch_greedy_cigars(ref)
