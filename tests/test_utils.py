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


def test_aligned_strings_reconstruction():
    """DISPLAY-style aligned pair decode (hurdle_matrix.h:204-228):
    I consumes read vs '-' in ref, D the reverse, M both; the rows must
    always be equal length and strip back to the consumed prefixes."""
    from asm_tpu.ops.cigar import aligned_strings

    a, b = aligned_strings("ACGTAC", "ACTAC", "2M1I3M")
    assert a == "ACGTAC"
    assert b == "AC-TAC"
    a, b = aligned_strings("ACTAC", "ACGTAC", "2M1D3M")
    assert a == "AC-TAC"
    assert b == "ACGTAC"
    # mixed ops incl. X/= synonyms; unreached suffixes stay off
    a, b = aligned_strings("AAACCC", "AAGCC", "2=1X1I2M")
    assert a == "AAACCC"
    assert b == "AAG-CC"
    assert len(a) == len(b)


def test_aligned_strings_match_greedy_kernel():
    """Every M/I/D count in a real greedy CIGAR must be consistent: the
    reconstruction consumes exactly the characters the kernel aligned."""
    import jax.numpy as jnp

    from asm_tpu.config import AlignConfig
    from asm_tpu.data.generator import generate_dataset
    from asm_tpu.encoding import encode_batch
    from asm_tpu.kernels.greedy import greedy_align
    from asm_tpu.ops.cigar import aligned_strings, batch_greedy_cigars

    cfg = AlignConfig(max_steps=24)
    reads, refs = generate_dataset(16, 80, 0.1, 0.8, seed=23)
    rc, rl, fc, fl = map(jnp.asarray, encode_batch(reads, refs, cfg.max_len))
    out = greedy_align(rc, rl, fc, fl, cfg)
    for read, ref, cigar in zip(reads, refs, batch_greedy_cigars(out)):
        a, b = aligned_strings(read, ref, cigar)
        assert len(a) == len(b)
        assert a.replace("-", "") == read[: len(a.replace("-", ""))]
        assert b.replace("-", "") == ref[: len(b.replace("-", ""))]


def test_decode_batch_matches_scalar():
    import numpy as np

    from asm_tpu.encoding import decode_batch, decode_string, encode_batch

    reads = ["ACGTACGT", "TTT", "GATTACA"]
    rc, rl, _, _ = encode_batch(reads, reads, 16)
    got = decode_batch(rc, rl)
    want = [decode_string(rc[i], int(rl[i])) for i in range(3)]
    assert got == want == reads


def test_runs_to_cigars_batch_matches_scalar():
    import numpy as np

    from asm_tpu.ops.cigar import runs_to_cigar, runs_to_cigars_batch

    rng = np.random.default_rng(4)
    ops = rng.choice([3, 4, 5], size=(64, 10)).astype(np.int8)
    runs = rng.integers(0, 5, size=(64, 10)).astype(np.int32)
    got = runs_to_cigars_batch(ops, runs)
    want = [runs_to_cigar(ops[i], runs[i]) for i in range(64)]
    assert got == want


def test_native_cigar_strings_packed_matches_numpy():
    import numpy as np

    from asm_tpu.native import cigar_strings_packed
    from asm_tpu.ops.cigar import runs_to_cigars_batch

    rng = np.random.default_rng(5)
    ops = rng.choice([3, 4, 5], size=(128, 12)).astype(np.uint16)
    runs = rng.integers(0, 8192, size=(128, 12)).astype(np.uint16)
    runs[:, 3] = 0  # empty slots skipped
    packed = (ops << 13) | (runs & 0x1FFF)
    got = cigar_strings_packed(packed)
    want = runs_to_cigars_batch((packed >> 13).astype(np.int8),
                                (packed & 0x1FFF).astype(np.int32))
    assert got == want
