"""Multi-device data parallelism on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import pytest

from asm_tpu.config import AlignConfig
from asm_tpu.data.generator import generate_dataset_arrays
from asm_tpu.parallel import make_mesh, shard_batch, batch_pspec
from asm_tpu.parallel.runner import (
    make_sharded_pipeline,
    make_sharded_greedy,
    unpack_stats,
)


@pytest.fixture(scope="module")
def corpus():
    return generate_dataset_arrays(64, 80, 0.1, seed=3)


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.size == 8  # conftest forces 8 virtual CPU devices


def test_shard_batch_places_on_mesh(corpus):
    mesh = make_mesh()
    rc, rl, fc, fl = shard_batch(mesh, *corpus)
    assert rc.sharding.is_equivalent_to(
        jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("data", None)
        ),
        rc.ndim,
    )
    with pytest.raises(ValueError):
        shard_batch(mesh, np.zeros((9, 4)))  # not divisible


def test_sharded_pipeline_matches_single_device(corpus):
    cfg = AlignConfig(k=3)
    mesh8 = make_mesh(8)
    mesh1 = make_mesh(1)
    args8 = shard_batch(mesh8, *corpus)
    args1 = shard_batch(mesh1, *corpus)
    nw8, g8, l8, s8 = make_sharded_pipeline(mesh8, cfg)(*args8)
    nw1, g1, l1, s1 = make_sharded_pipeline(mesh1, cfg)(*args1)
    np.testing.assert_array_equal(np.asarray(nw8), np.asarray(nw1))
    np.testing.assert_array_equal(np.asarray(g8), np.asarray(g1))
    np.testing.assert_array_equal(np.asarray(l8), np.asarray(l1))
    np.testing.assert_array_equal(np.asarray(s8), np.asarray(s1))
    stats = unpack_stats(np.asarray(s8))
    assert stats.pairs == 64
    assert 0 <= stats.greedy_correct <= 64
    assert stats.greedy_cost_sum >= stats.nw_penalty_sum


def test_sharded_greedy_pallas_matches_xla(corpus):
    """The EXACT path bench.py times — make_sharded_greedy(impl='pallas',
    want_cigar=False) under shard_map — against the sharded XLA kernel,
    on the hermetic 8-device CPU mesh (pallas in interpret mode)."""
    cfg = AlignConfig(k=3, max_steps=24)
    mesh = make_mesh()
    args = shard_batch(mesh, *corpus)
    out_p = make_sharded_greedy(
        mesh, cfg, impl="pallas", want_cigar=False, interpret=True
    )(*args)
    out_x = make_sharded_greedy(mesh, cfg, impl="xla")(*args)
    np.testing.assert_array_equal(
        np.asarray(out_p["cost"]), np.asarray(out_x["cost"])
    )
    np.testing.assert_array_equal(
        np.asarray(out_p["steps"]), np.asarray(out_x["steps"])
    )


def test_sharded_greedy_pallas_pre_staged_matches_xla(corpus):
    """bench.py's production path — pre-staged position-major corpus,
    make_sharded_greedy(impl='pallas', pre_staged=True) — equals the
    sharded XLA kernel on the hermetic 8-device CPU mesh."""
    from asm_tpu.kernels.greedy_pallas import stage_swar_t
    from asm_tpu.parallel import shard_on_axis

    cfg = AlignConfig(k=3, max_steps=24)
    mesh = make_mesh()
    rc, rl, fc, fl = corpus
    rl_d, fl_d = shard_batch(mesh, rl, fl)
    out_p = make_sharded_greedy(
        mesh, cfg, impl="pallas", want_cigar=False, interpret=True,
        pre_staged=True,
    )(
        shard_on_axis(mesh, stage_swar_t(rc), 1), rl_d,
        shard_on_axis(mesh, stage_swar_t(fc), 1), fl_d,
    )
    out_x = make_sharded_greedy(mesh, cfg, impl="xla")(
        *shard_batch(mesh, *corpus)
    )
    np.testing.assert_array_equal(
        np.asarray(out_p["cost"]), np.asarray(out_x["cost"])
    )
    np.testing.assert_array_equal(
        np.asarray(out_p["steps"]), np.asarray(out_x["steps"])
    )


def test_sharded_greedy_matches_plain(corpus):
    import functools
    import jax.numpy as jnp
    from asm_tpu.kernels.greedy import greedy_align

    cfg = AlignConfig(k=3)
    mesh = make_mesh()
    out_sharded = make_sharded_greedy(mesh, cfg)(*shard_batch(mesh, *corpus))
    out_plain = jax.jit(functools.partial(greedy_align, cfg=cfg))(
        *map(jnp.asarray, corpus)
    )
    np.testing.assert_array_equal(
        np.asarray(out_sharded["cost"]), np.asarray(out_plain["cost"])
    )
    np.testing.assert_array_equal(
        np.asarray(out_sharded["cigar_runs"]),
        np.asarray(out_plain["cigar_runs"]),
    )


def test_sharded_greedy_pallas_planes_matches_xla(corpus):
    """bench.py's production path — pre-staged 2-bit-plane corpus,
    make_sharded_greedy(impl='pallas', pre_staged='planes') — equals the
    sharded XLA kernel on the hermetic 8-device CPU mesh."""
    from asm_tpu.kernels.greedy_pallas import stage_planes_t
    from asm_tpu.parallel import shard_on_axis

    cfg = AlignConfig(k=3, max_steps=24)
    mesh = make_mesh()
    rc, rl, fc, fl = corpus
    rl_d, fl_d = shard_batch(mesh, rl, fl)
    out_p = make_sharded_greedy(
        mesh, cfg, impl="pallas", want_cigar=False, interpret=True,
        pre_staged="planes",
    )(
        shard_on_axis(mesh, stage_planes_t(rc), 1), rl_d,
        shard_on_axis(mesh, stage_planes_t(fc), 1), fl_d,
    )
    out_x = make_sharded_greedy(mesh, cfg, impl="xla")(
        *shard_batch(mesh, *corpus)
    )
    np.testing.assert_array_equal(
        np.asarray(out_p["cost"]), np.asarray(out_x["cost"])
    )
    np.testing.assert_array_equal(
        np.asarray(out_p["steps"]), np.asarray(out_x["steps"])
    )


def test_sharded_greedy_pallas_lanes_matches_xla(corpus):
    """bench.py's default production path — pre-staged LANE ROWS,
    make_sharded_greedy(impl='pallas', pre_staged='lanes') — equals the
    sharded XLA kernel on the hermetic 8-device CPU mesh."""
    from asm_tpu.kernels.greedy_pallas import stage_lanes_t
    from asm_tpu.parallel import shard_on_axis

    cfg = AlignConfig(k=3, max_steps=24)
    mesh = make_mesh()
    rc, rl, fc, fl = corpus
    rl_d, fl_d = shard_batch(mesh, rl, fl)
    lanes = stage_lanes_t(rc, rl, fc, fl, cfg.k)
    H = (lanes.shape[0] + 1) // 2
    out_p = make_sharded_greedy(
        mesh, cfg, impl="pallas", want_cigar=False, interpret=True,
        pre_staged="lanes",
    )(
        shard_on_axis(mesh, np.ascontiguousarray(lanes[:H]), 1), rl_d,
        shard_on_axis(mesh, np.ascontiguousarray(lanes[H:]), 1), fl_d,
    )
    out_x = make_sharded_greedy(mesh, cfg, impl="xla")(
        *shard_batch(mesh, *corpus)
    )
    np.testing.assert_array_equal(
        np.asarray(out_p["cost"]), np.asarray(out_x["cost"])
    )
    np.testing.assert_array_equal(
        np.asarray(out_p["steps"]), np.asarray(out_x["steps"])
    )


def test_sharded_greedy_pallas_planes_tiled_matches_xla(corpus):
    """Tile-major planes (pre_staged='planes_tiled', the fastest-streaming
    input layout) under shard_map == the sharded XLA kernel."""
    from asm_tpu.kernels.greedy_pallas import stage_planes_tiled_t
    from asm_tpu.parallel import shard_on_axis

    cfg = AlignConfig(k=3, max_steps=24)
    mesh = make_mesh()
    rc, rl, fc, fl = corpus
    # pad the batch to mesh.size tiles so each shard is whole tiles
    from asm_tpu.kernels.greedy_pallas import _TILE
    reps = (mesh.size * _TILE + len(rl) - 1) // len(rl)
    rc, rl, fc, fl = (np.concatenate([a] * reps)[: mesh.size * _TILE]
                      for a in (rc, rl, fc, fl))
    rl_d, fl_d = shard_batch(mesh, rl, fl)
    out_p = make_sharded_greedy(
        mesh, cfg, impl="pallas", want_cigar=False, interpret=True,
        pre_staged="planes_tiled",
    )(
        shard_on_axis(mesh, stage_planes_tiled_t(rc), 0), rl_d,
        shard_on_axis(mesh, stage_planes_tiled_t(fc), 0), fl_d,
    )
    out_x = make_sharded_greedy(mesh, cfg, impl="xla")(
        *shard_batch(mesh, rc, rl, fc, fl)
    )
    np.testing.assert_array_equal(
        np.asarray(out_p["cost"]), np.asarray(out_x["cost"])
    )
    np.testing.assert_array_equal(
        np.asarray(out_p["steps"]), np.asarray(out_x["steps"])
    )
