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
