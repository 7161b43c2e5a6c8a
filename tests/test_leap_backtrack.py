"""LEAP backtrack: energy-history tables -> edit lists (LV::backtrack)."""

import numpy as np
import jax.numpy as jnp
import pytest

from asm_tpu.config import AlignConfig
from asm_tpu.encoding import encode_batch
from asm_tpu.kernels.leap import leap_align
from asm_tpu.kernels.leap_backtrack import leap_backtrack_batch
from asm_tpu.data.generator import generate_dataset


def _decompose_penalty(edits, cfg, skip_correction):
    """Recompute the energy a backtrack edit list implies: x per mismatch,
    o per gap-chain opener / e per extension (the is_open tag). The
    prepended lane-correction gaps carry no energy (LV_BAG.cpp:254-264)."""
    core = edits[skip_correction:-1]  # drop corrections + terminal run
    pen = 0
    for op, _, is_open in core:
        if op == "M":
            pen += cfg.x
        else:
            pen += cfg.o if is_open else cfg.e
    return pen


@pytest.mark.parametrize("err,x,o,e", [(0.05, 1, 1, 1), (0.10, 1, 1, 1),
                                       (0.10, 2, 3, 1)])
def test_backtrack_penalty_decomposition(err, x, o, e):
    cfg = AlignConfig(x=x, o=o, e=e, k=3, leap_af_threshold=200)
    reads, refs = generate_dataset(24, 100, err, 0.9, seed=int(err * 100 + x))
    rc, rl, fc, fl = encode_batch(reads, refs, cfg.max_len)
    out = leap_align(
        jnp.asarray(rc), jnp.asarray(rl), jnp.asarray(fc), jnp.asarray(fl),
        cfg, want_history=True,
    )
    results = leap_backtrack_batch(out, cfg)
    pens = np.asarray(out["penalty"])
    shifts = np.asarray(out["lane_shift"])
    n_checked = 0
    for b, r in enumerate(results):
        if r is None:
            continue
        edits, cigar = r
        skip = abs(int(shifts[b]))
        # prepended lane-correction gap entries match the final lane shift
        for op, run, _ in edits[:skip]:
            assert run == 0 and op in ("I", "D")
        assert _decompose_penalty(edits, cfg, skip) == pens[b], (b, edits)
        assert cigar  # renders
        n_checked += 1
    assert n_checked >= 20


def test_backtrack_identical_pair():
    cfg = AlignConfig(k=2)
    rc, rl, fc, fl = encode_batch(["ACGTACGT"], ["ACGTACGT"], 128)
    out = leap_align(
        jnp.asarray(rc), jnp.asarray(rl), jnp.asarray(fc), jnp.asarray(fl),
        cfg, want_history=True,
    )
    (edits, cigar), = leap_backtrack_batch(out, cfg)
    assert edits == [("", 8, False)]
    assert cigar == "8"


def test_backtrack_single_mismatch():
    cfg = AlignConfig(k=2)
    rc, rl, fc, fl = encode_batch(["ACGTACGT"], ["ACGAACGT"], 128)
    out = leap_align(
        jnp.asarray(rc), jnp.asarray(rl), jnp.asarray(fc), jnp.asarray(fl),
        cfg, want_history=True,
    )
    (edits, cigar), = leap_backtrack_batch(out, cfg)
    assert int(np.asarray(out["penalty"])[0]) == 1
    # one mismatch, 4 matches after it (backward emission), 3 before
    assert edits == [("M", 4, False), ("", 3, False)]
    assert cigar == "3M4"
