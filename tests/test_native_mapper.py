"""Native runtime (IO, generator, FM-index) + mapper end-to-end tests.

Skipped wholesale if the native library cannot be built (needs g++)."""

import os

import numpy as np
import pytest

pytest.importorskip("asm_tpu.native")
from asm_tpu.native import load_native

if load_native() is None:
    pytest.skip("native library unavailable", allow_module_level=True)

from asm_tpu.native import (
    FMIndex,
    generate_dataset_native,
    read_fasta_native,
    read_fastq_native,
    read_pair_file_native,
    write_pair_file_native,
)
from asm_tpu.mapper.core import MapperConfig, build_index, map_reads
from asm_tpu.encoding import decode_string


def test_pair_file_roundtrip(tmp_path):
    rc, rl, fc, fl = generate_dataset_native(200, 100, 0.1, seed=5)
    assert (rc[:, 100:] == 4).all()
    for i in range(200):
        assert (fc[i, fl[i]:] == 5).all()
    path = str(tmp_path / "pairs.seq")
    write_pair_file_native(path, rc, rl, fc, fl)
    rc2, rl2, fc2, fl2 = read_pair_file_native(path, 200)
    np.testing.assert_array_equal(rc, rc2)
    np.testing.assert_array_equal(fc, fc2)
    np.testing.assert_array_equal(rl, rl2)
    np.testing.assert_array_equal(fl, fl2)


def test_pair_file_matches_python_reader(tmp_path):
    from asm_tpu.data.io import read_pair_file
    from asm_tpu.encoding import encode_batch

    rc, rl, fc, fl = generate_dataset_native(50, 80, 0.15, seed=9)
    path = str(tmp_path / "p.seq")
    write_pair_file_native(path, rc, rl, fc, fl)
    reads, refs = read_pair_file(path)
    prc, prl, pfc, pfl = encode_batch(reads, refs, 128)
    np.testing.assert_array_equal(rc, prc)
    np.testing.assert_array_equal(fc, pfc)


def test_fm_index_search_locate_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    text = rng.integers(0, 4, size=8000).astype(np.int8)
    idx = FMIndex.build(text)
    assert len(idx) == 8000
    for _ in range(30):
        p = int(rng.integers(0, 7950))
        L = int(rng.integers(8, 40))
        lo, hi = idx.search(text[p: p + L])
        pos = idx.locate(lo, hi, 64)
        assert p in pos
        for q in pos:
            np.testing.assert_array_equal(text[q: q + L], text[p: p + L])
    path = str(tmp_path / "x.idx")
    idx.save(path)
    idx2 = FMIndex.load(path)
    lo, hi = idx2.search(text[500:540])
    assert 500 in idx2.locate(lo, hi)


def test_fasta_fastq_readers(tmp_path):
    fa = tmp_path / "ref.fa"
    fa.write_text(">chr1 test\nACGTACGTAC\nGGGTTT\n>chr2\nTTTT\n")
    codes, starts = read_fasta_native(str(fa))
    assert decode_string(codes) == "ACGTACGTACGGGTTTTTTT"
    assert starts.tolist() == [0, 16]

    fq = tmp_path / "r.fq"
    fq.write_text("@r1 extra\nACGT\n+\nIIII\n@r2\nGGTTA\n+\nIIIII\n")
    reads, lens, names = read_fastq_native(str(fq), 10)
    assert names == ["r1", "r2"]
    assert lens.tolist() == [4, 5]
    assert decode_string(reads[0], 4) == "ACGT"
    assert decode_string(reads[1], 5) == "GGTTA"


def test_mapper_end_to_end(tmp_path):
    """Plant reads (with errors) at known positions; the mapper must
    recover them — the reference pipeline (indexer + my-mapper) in one."""
    rng = np.random.default_rng(11)
    genome = rng.integers(0, 4, size=20000).astype(np.int8)
    idx = build_index(genome, str(tmp_path / "g.idx"))
    idx = FMIndex.load(str(tmp_path / "g.idx"))

    n_reads, rlen = 40, 100
    starts = rng.integers(0, genome.shape[0] - rlen - 5, size=n_reads)
    reads = np.full((n_reads, 128), 4, np.int8)
    lens = np.full(n_reads, rlen, np.int32)
    for i, s in enumerate(starts):
        r = genome[s: s + rlen].copy()
        for _ in range(2):  # two mismatches
            p = int(rng.integers(0, rlen))
            r[p] = (r[p] + 1 + rng.integers(0, 3)) % 4
        reads[i, :rlen] = r

    mcfg = MapperConfig(max_errors=3)
    best, sam = map_reads(idx, genome, reads, lens, None, mcfg)
    ok = 0
    for i, b in enumerate(best):
        assert b is not None, f"read {i} unmapped"
        if abs(b["pos"] - int(starts[i])) <= 3:
            ok += 1
        assert b["cost"] <= 4
        assert b["mapq"] == 60 + b["cost"]  # main.cpp:96 quirk
    assert ok >= n_reads - 1
    assert sam.startswith("@HD")
    assert sam.count("\n") == n_reads + 3


def test_native_coverage_matches_python():
    import jax.numpy as jnp
    from asm_tpu.config import AlignConfig
    from asm_tpu.data.generator import generate_dataset
    from asm_tpu.encoding import encode_batch, decode_string
    from asm_tpu.kernels.greedy import greedy_align
    from asm_tpu.kernels.nw import nw_align
    from asm_tpu.ops.cigar import batch_greedy_cigars, batch_nw_cigars
    from asm_tpu.metrics.coverage import check_coverage
    from asm_tpu.native import coverage_batch_native

    cfg = AlignConfig()
    reads, refs = generate_dataset(128, 100, 0.15, 0.9, seed=17)
    rc, rl, fc, fl = encode_batch(reads, refs, 128)
    a = [jnp.asarray(v) for v in (rc, rl, fc, fl)]
    g = greedy_align(*a, cfg)
    _, nw_ops = nw_align(*a)
    got = coverage_batch_native(
        rc, rl, np.asarray(g["cigar_ops"]), np.asarray(g["cigar_runs"]),
        np.asarray(nw_ops),
    )
    gc = batch_greedy_cigars(g)
    nc = batch_nw_cigars(np.asarray(nw_ops))
    exp = np.array(
        [check_coverage(reads[i], refs[i], gc[i], nc[i], 1, 3)
         for i in range(128)], bool,
    )
    np.testing.assert_array_equal(got, exp)


def test_repeat_region_read_still_maps(tmp_path):
    """A read whose EVERY pigeonhole seed lands inside a high-copy repeat
    must still map: the old candidate generator silently SKIPPED seeds
    with oversize SA ranges (losing the site entirely); sampling the SA
    range keeps repeat copies represented and rescoring picks a best-cost
    placement (cf. SeqAn3 enumerating every hit, mapper/main.cpp:67-77)."""
    from asm_tpu.mapper.core import MapperConfig, build_index, map_reads
    from asm_tpu.encoding import encode_string, PAD_READ

    rng = np.random.default_rng(9)
    unit = "ACGTTGCATCGATCAGGTCCAATGCCGTAGGACTTACGGA"  # 40 bp repeat unit
    copies = 64  # SA range of any seed ~64 >> max_hits_per_seed
    genome = unit * copies
    ref_codes = encode_string(genome, len(genome), pad=5).astype(np.int8)

    # read = two units straight out of the repeat (error-free)
    read = unit * 2
    rc = encode_string(read, 128, pad=PAD_READ)[None, :].astype(np.int8)
    rl = np.array([len(read)], np.int32)

    idx = build_index(ref_codes)
    mcfg = MapperConfig(max_errors=3, max_hits_per_seed=8,
                        max_candidates=32)
    best, sam = map_reads(idx, ref_codes, rc, rl, mcfg=mcfg)
    assert best[0] is not None, "repeat-region read went unmapped"
    # an error-free placement exists at every unit boundary; the mapper
    # must find one at cost 0
    assert best[0]["cost"] == 0
    assert best[0]["pos"] % len(unit) == 0


def test_megabase_genome_maps(tmp_path):
    """Scale step: a 10 Mbp genome through index build (counting-sort
    prefix doubling) + save/load (checkpointed SA sampling, ~0.27 B/char
    locate memory instead of the old full SA's 4 B/char) + batched
    pigeonhole mapping. Reads planted at known positions must map back
    exactly with cost 0 within the suite's time budget."""
    from asm_tpu.mapper.core import MapperConfig, build_index, map_reads

    rng = np.random.default_rng(11)
    n = 10_000_000
    genome = rng.integers(0, 4, size=n, dtype=np.int8)
    idx = build_index(genome, out_path=str(tmp_path / "g.idx"))
    idx2 = FMIndex.load(str(tmp_path / "g.idx"))

    n_reads, rl = 64, 100
    pos = rng.integers(0, n - rl, size=n_reads)
    reads = np.stack([genome[p:p + rl] for p in pos])
    read_codes = np.full((n_reads, 128), 4, np.int8)
    read_codes[:, :rl] = reads
    read_lens = np.full(n_reads, rl, np.int32)

    best, sam = map_reads(idx2, genome, read_codes, read_lens,
                          mcfg=MapperConfig(max_errors=2))
    for i in range(n_reads):
        assert best[i] is not None, i
        assert best[i]["pos"] == pos[i], (i, best[i]["pos"], pos[i])
        # the rescoring window is read_len + 1 (reference quirk,
        # mapper/main.cpp:79-80), so a perfect hit globally costs 1 gap
        assert best[i]["cost"] <= 1, i
    assert sam.count("\n") == n_reads + 3
