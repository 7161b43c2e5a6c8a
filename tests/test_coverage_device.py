"""Device-side coverage (masks + positional certificate) vs the host
string metric — must agree pair-for-pair once the fallback is applied."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from asm_tpu.config import AlignConfig
from asm_tpu.data.generator import generate_dataset
from asm_tpu.encoding import encode_batch, decode_string
from asm_tpu.kernels.greedy import greedy_align
from asm_tpu.kernels.nw import nw_align
from asm_tpu.metrics.coverage import check_coverage
from asm_tpu.metrics.coverage_device import (
    greedy_match_mask,
    positional_covered,
)
from asm_tpu.ops.cigar import batch_greedy_cigars, batch_nw_cigars


@pytest.mark.parametrize("err,mr,seed,min_hit", [
    (0.05, 0.96, 21, 0.85), (0.15, 0.96, 22, 0.6), (0.3, 0.6, 23, 0.0),
])
def test_device_coverage_matches_host(err, mr, seed, min_hit):
    reads, refs = generate_dataset(128, 100, err, mr, seed=seed)
    rc, rl, fc, fl = map(jnp.asarray, encode_batch(reads, refs, 128))
    cfg = AlignConfig()

    pen, nw_ops, nw_mask = nw_align(rc, rl, fc, fl, 1, 1, 1,
                                    match_mask_threshold=3)
    g = greedy_align(rc, rl, fc, fl, cfg)
    g_mask = greedy_match_mask(g["cigar_ops"], g["cigar_runs"], 128, 1)
    cert = np.asarray(positional_covered(g_mask, nw_mask))

    nw_cigars = batch_nw_cigars(np.asarray(nw_ops))
    g_cigars = batch_greedy_cigars(
        {k: np.asarray(v) for k, v in g.items() if k.startswith("cigar")}
    )
    rc_np, rl_np = np.asarray(rc), np.asarray(rl)
    fc_np, fl_np = np.asarray(fc), np.asarray(fl)
    n_cert_wrong = 0
    for b in range(128):
        s1 = decode_string(rc_np[b], int(rl_np[b]))
        s2 = decode_string(fc_np[b], int(fl_np[b]))
        host = check_coverage(s1, s2, g_cigars[b], nw_cigars[b], 1, 3)
        if cert[b]:
            # the certificate is SOUND: certified implies host-covered
            assert host, (b, s1, s2, g_cigars[b], nw_cigars[b])
        else:
            n_cert_wrong += host  # fallback handles these
    # the fast path should certify most covered pairs at realistic rates
    # (the character-based covers() is looser than positional subset, so
    # the hit rate drops as error rates climb — the fallback stays exact)
    host_covered = cert.sum() + n_cert_wrong
    assert cert.sum() >= min_hit * host_covered


def test_nw_match_mask_matches_cigar_runs():
    """The traceback-emitted mask equals the mask recomputed from the
    decoded CIGAR (threshold 3)."""
    reads, refs = generate_dataset(64, 100, 0.1, 0.9, seed=31)
    rc, rl, fc, fl = map(jnp.asarray, encode_batch(reads, refs, 128))
    pen, nw_ops, nw_mask = nw_align(rc, rl, fc, fl, 1, 1, 1,
                                    match_mask_threshold=3)
    # also check the two-output form is unchanged
    pen2, nw_ops2 = nw_align(rc, rl, fc, fl, 1, 1, 1)
    np.testing.assert_array_equal(np.asarray(pen), np.asarray(pen2))
    np.testing.assert_array_equal(np.asarray(nw_ops), np.asarray(nw_ops2))

    nw_mask = np.asarray(nw_mask)
    cigars = batch_nw_cigars(np.asarray(nw_ops))
    import re
    for b in range(64):
        want = np.zeros(128, bool)
        r = 0
        for run, op in re.findall(r"(\d+)([=XID])", cigars[b]):
            run = int(run)
            if op == "=":
                if run >= 3:
                    want[r:r + run] = True
                r += run
            elif op in ("X", "I"):
                r += run
        np.testing.assert_array_equal(nw_mask[b], want, err_msg=str(b))
