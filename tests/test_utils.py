"""Utilities: profiling counters + corpus cache roundtrip."""

import numpy as np

from asm_tpu.utils import KernelStats, Timer, save_corpus, load_corpus
from asm_tpu.data.generator import generate_dataset_arrays


def test_kernel_stats():
    s = KernelStats(pairs=1_000_000, seconds=0.5, cells_per_pair=128 * 128)
    assert s.aligns_per_sec == 2_000_000
    assert s.cells_per_sec == 2_000_000 * 128 * 128
    assert "aligns/s" in s.line("Greedy")


def test_timer_barriers():
    import jax.numpy as jnp

    t = Timer()
    t.start()
    total = t.stop(jnp.ones((8, 8)))
    assert total > 0 and t.count == 1


def test_corpus_cache_roundtrip(tmp_path):
    corpus = generate_dataset_arrays(32, 50, 0.1, seed=7)
    path = str(tmp_path / "c.npz")
    save_corpus(path, *corpus, n=32, err=0.1)
    back = load_corpus(path, n=32, err=0.1)
    for a, b in zip(corpus, back):
        np.testing.assert_array_equal(a, b)
    # parameter mismatch -> regenerate signal
    assert load_corpus(path, n=64, err=0.1) is None
    assert load_corpus(str(tmp_path / "missing.npz"), n=32) is None
