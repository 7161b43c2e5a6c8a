"""SHD kernel == scalar emulator (which is itself validated against the
COMPILED reference filter by tools/validate_vs_reference.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from asm_tpu.data.generator import generate_dataset
from asm_tpu.encoding import encode_batch
from asm_tpu.kernels.shd import shd_filter, shd_gate_masks, _popcount_shd
from asm_tpu.ops.hurdles import build_leap_lanes
from asm_tpu.reference_impl import shd_ref

_CODE = {"A": 0, "C": 1, "G": 2, "T": 3}


def _emu_filter(a: str, b: str, k: int) -> bool:
    length = max(len(a), len(b))
    a0, a1 = shd_ref.planes_from_codes([_CODE[c] for c in a], 128)
    b0, b1 = shd_ref.planes_from_codes([_CODE[c] for c in b], 128)
    return shd_ref.bit_vec_filter(a0, a1, b0, b1, length, k)


def test_flip_false_zeros_equals_reference_cascade():
    """The kernel's closed-form flip == the MASK_SRS window cascade, on
    dense random bitvectors (the cascade's closure argument)."""
    from asm_tpu.kernels.shd import _flip_false_zeros

    rng = np.random.default_rng(0)
    for density in (0.2, 0.5, 0.8):
        rows = (rng.random((64, 128)) < density).astype(np.int8)
        got = np.asarray(_flip_false_zeros(jnp.asarray(rows)))
        for r in range(64):
            v = int.from_bytes(np.packbits(rows[r], bitorder="little")
                               .tobytes(), "little")
            want = shd_ref.flip_false_zero(v, 128)
            got_int = int.from_bytes(
                np.packbits(got[r], bitorder="little").tobytes(), "little")
            assert got_int == want, (density, r)


def test_popcount_shd_matches_table():
    rng = np.random.default_rng(1)
    rows = (rng.random((128, 128)) < 0.4).astype(np.int8)
    got = np.asarray(_popcount_shd(jnp.asarray(rows)))
    for r in range(128):
        v = int.from_bytes(np.packbits(rows[r], bitorder="little")
                           .tobytes(), "little")
        assert got[r] == shd_ref.popcount_shd(v, 128), r


@pytest.mark.parametrize("err,mr,k,seed", [
    (0.02, 0.96, 3, 5), (0.05, 0.96, 3, 6), (0.10, 0.96, 3, 7),
    (0.10, 0.50, 5, 8), (0.20, 0.96, 3, 9),
])
def test_shd_filter_matches_emulator(err, mr, k, seed):
    reads, refs = generate_dataset(96, 100, err, mr, seed=seed)
    rc, rl, fc, fl = map(jnp.asarray, encode_batch(reads, refs, 128))
    got = np.asarray(shd_filter(rc, rl, fc, fl, max_error=k))
    for i, (a, b) in enumerate(zip(reads, refs)):
        assert bool(got[i]) == _emu_filter(a, b, k), (i, a, b)


def test_shd_gate_masks_matches_emulator():
    """The production gate (masks variant) on LEAP-style lane masks."""
    k = 3
    reads, refs = generate_dataset(64, 100, 0.05, 0.96, seed=12)
    rc, rl, fc, fl = map(jnp.asarray, encode_batch(reads, refs, 128))
    # reference gate compares 0-padded buffers: map pads to 'A' and build
    # the same 2k+1 lane hamming masks calculate_masks builds
    rc0 = jnp.where(rc < 4, rc, 0)
    fc0 = jnp.where(fc < 4, fc, 0)
    lanes = build_leap_lanes(rc0, fc0, k)[:, 1:-1, :]  # drop sentinel lanes
    length = jnp.maximum(rl, fl)
    got = np.asarray(shd_gate_masks(lanes, length, max_error=k))
    for i, (a, b) in enumerate(zip(reads, refs)):
        masks = shd_ref.calculate_masks_ref(
            [_CODE[c] for c in a], [_CODE[c] for c in b], k, width=256)
        want = shd_ref.bit_vec_filter_masks(masks, max(len(a), len(b)), k)
        assert bool(got[i]) == want, i
