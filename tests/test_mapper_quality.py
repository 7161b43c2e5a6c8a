"""Mapper QUALITY pinned in the suite (VERDICT r3 weak #5): recall on a
known-origin corpus at megabase scale, with the real-profile error
injector. Every read whose injected error count is within the pigeonhole
budget must map back to its true origin."""

import numpy as np


def test_mapper_recall_known_origins():
    from asm_tpu.mapper.core import MapperConfig, build_index, map_reads
    from asm_tpu.mapper.simulate import sample_reads

    rng = np.random.default_rng(5)
    genome = rng.integers(0, 4, size=2_000_000, dtype=np.int8)
    idx = build_index(genome)
    reads, lens, origins, nerr = sample_reads(genome, 600, 100, rng)
    mcfg = MapperConfig(max_errors=3, batch=4096)
    best, _ = map_reads(idx, genome, reads, lens, mcfg=mcfg)

    ok = np.array([
        b is not None and abs(b["pos"] - int(o)) <= 5
        for b, o in zip(best, origins)
    ])
    elig = nerr <= mcfg.max_errors
    assert elig.sum() >= 400  # the profile leaves most reads eligible
    # pigeonhole guarantee: a clean seed exists => the true locus is a
    # candidate => best-cost rescoring lands within indel slack
    assert float(ok[elig].mean()) >= 0.995, ok[elig].mean()
    # overall recall degrades only through over-budget reads
    assert float(ok.mean()) >= 0.90
    # MAPQ quirk (main.cpp:96)
    for b in best:
        if b is not None:
            assert b["mapq"] == 60 + b["cost"]
