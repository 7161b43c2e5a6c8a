"""Long-sequence headline rows (VERDICT r4 item #3).

The reference hard-caps reads at 128 chars (GASMA/utils.h:24) or 256
(LEAP_SIMD/LV_BAG.h:18); this framework's max_len is configuration.
Round 4 proved L=256/512 CORRECT (tests/test_long_sequences.py); this
tool proves they run AT SPEED: greedy, LEAP penalty, and fused
LEAP-CIGAR throughput on multi-million-pair corpora at L=256 and
L=512, with the roofline issue-bound context (vreg-ops/pair scales
~linearly with the word count W = L/32, so the expected aligns/s is
the L=128 headline scaled by ~128/L).

Corpora are sized to constant total bases (pairs x L ~= 2.1 G so the
device work per row matches the 67M x 100 bp headline order):
L=256 -> 8M pairs, L=512 -> 4M pairs, err=0.05, unsorted (no
difficulty sort / measured caches — the rows carry their own bounds;
the sort machinery is orthogonal and measured in bench.py).

Env: LS_TILE (grid tile, default 2048), LS_PAIRS_BASE (default 2^23 at
L=256, halved per doubling), LS_ERR (default 0.05), LS_REPS (default 3).
Usage (on the TPU): python tools/longseq_headline.py [256 512]
Appends measured rows to stdout as JSON lines; paste/record into
RESULTS_headlines_v5e.txt.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
import sys
import time

os.environ.setdefault("ASM_GREEDY_TILE", os.environ.get("LS_TILE", "2048"))
os.environ.setdefault("ASM_LEAP_TILE", os.environ.get("LS_TILE", "2048"))

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".jax_cache"))

from asm_tpu.config import AlignConfig  # noqa: E402
from asm_tpu.utils import force_completion  # noqa: E402

# measured on this chip by tools/roofline.py (two-point-slope
# microkernels, round 4): vector-issue peak and HBM stream rate
VPU_VREG_OPS = 3.34e9
HBM_BPS = 514e9


def _time_chunks(fn, chunks, reps):
    """Dispatch every chunk, force only the LAST (in-order device queue
    => it is the barrier for all), return best wall over reps."""
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [fn(*c) for c in chunks]
        force_completion(outs[-1])
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    return best, outs


def _counts(kernel_partial, args, loop_iters):
    from tools.roofline import count_jaxpr, find_pallas_jaxprs

    jx = jax.make_jaxpr(kernel_partial)(*args)
    kj = find_pallas_jaxprs(jx.jaxpr)
    assert kj, "no pallas_call found"
    kj0 = getattr(kj[0], "jaxpr", kj[0])
    return count_jaxpr(kj0, loop_iters)


def run_length(L, err, reps, tile):
    from asm_tpu.kernels.greedy_pallas import (greedy_align_pallas,
                                               stage_planes_tiled_t)
    from asm_tpu.kernels.leap_pallas import (leap_align_pallas,
                                             leap_cigar_tile)
    from asm_tpu.native import generate_dataset_native

    base = int(os.environ.get("LS_PAIRS_BASE", 1 << 23))
    pairs = base * 256 // L
    length = L - 6 - L // 50  # reads shy of the cap (insertions fit)
    print(f"--- L={L}: {pairs/1e6:.1f}M pairs, read length {length}, "
          f"err={err}, tile={tile} ---", file=sys.stderr)

    t0 = time.perf_counter()
    rc, rl, fc, fl = generate_dataset_native(
        pairs, length, err, 0.96, seed=7, max_len=L)
    print(f"corpus: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    rc_t = stage_planes_tiled_t(rc, tile=tile)
    fc_t = stage_planes_tiled_t(fc, tile=tile)
    print(f"staging: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    chunk = min(pairs, 1 << 22)
    assert pairs % chunk == 0 and chunk % tile == 0
    nbt = chunk // tile
    chunks = [
        (jax.device_put(np.ascontiguousarray(rc_t[i: i + nbt])),
         jax.device_put(rl[lo: lo + chunk]),
         jax.device_put(np.ascontiguousarray(fc_t[i: i + nbt])),
         jax.device_put(fl[lo: lo + chunk]))
        for lo, i in [(c * chunk, c * nbt)
                      for c in range(pairs // chunk)]
    ]
    for c in chunks:
        for a in c:
            force_completion(a)

    rows = []
    W = L // 32

    # ---- greedy ----------------------------------------------------
    max_steps = 64 if L <= 256 else 96
    gcfg = AlignConfig(x=1, o=1, e=1, k=3, max_len=L, max_steps=max_steps)
    gfn = jax.jit(functools.partial(
        greedy_align_pallas, cfg=gcfg, want_cigar=False,
        pre_staged="planes_tiled"))
    g = lambda a, b, c, d: gfn(a, b, c, d)  # noqa: E731
    gw = jax.jit(lambda a, b, c, d: (
        (lambda r: (r["cost"], r["steps"]))(gfn(a, b, c, d))))
    # warmup + steps stats
    out0 = gw(*chunks[0])
    steps0 = np.asarray(out0[1])
    smax, smean = int(steps0.max()), float(steps0.mean())
    assert smax < max_steps, (smax, max_steps)
    dt, outs = _time_chunks(
        jax.jit(lambda a, b, c, d: gfn(a, b, c, d)["cost"]), chunks, reps)
    checksum = sum(int(np.asarray(o).sum()) for o in outs)
    gps = pairs / dt
    cnt = _counts(functools.partial(
        greedy_align_pallas, cfg=gcfg, want_cigar=False,
        pre_staged="planes_tiled"), chunks[0], [max(smean - 1, 0)])
    t_bound = (sum(cnt.values()) / tile) / VPU_VREG_OPS
    rows.append(dict(
        kernel="greedy", L=L, pairs=pairs, aligns_per_sec=round(gps),
        ns_per_pair=round(1e9 / gps, 2),
        issue_bound_ns=round(t_bound * 1e9, 2),
        vs_bound=round((1e9 / gps) / (t_bound * 1e9), 2),
        steps_mean=round(smean, 1), steps_max=smax,
        checksum=checksum))
    print(json.dumps(rows[-1]))

    # ---- LEAP penalty ----------------------------------------------
    lcfg = AlignConfig(x=1, o=1, e=1, k=3, max_len=L)
    lfn = jax.jit(functools.partial(
        leap_align_pallas, cfg=lcfg, pre_staged="planes_tiled"))
    pfn = jax.jit(lambda a, b, c, d: (
        (lambda r: (r["passed"], r["penalty"]))(lfn(a, b, c, d))))
    p0 = pfn(*chunks[0])
    passed0 = np.asarray(p0[0])
    pen0 = np.asarray(p0[1])
    emax = int(pen0[passed0 != 0].max())
    emean = float(pen0[passed0 != 0].mean())
    dt, outs = _time_chunks(
        jax.jit(lambda a, b, c, d: lfn(a, b, c, d)["penalty"]),
        chunks, reps)
    lps = pairs / dt
    cnt = _counts(functools.partial(
        leap_align_pallas, cfg=lcfg, pre_staged="planes_tiled"),
        chunks[0], [emean / 2])  # steady loop runs 2 levels/iteration
    t_bound = (sum(cnt.values()) / tile) / VPU_VREG_OPS
    rows.append(dict(
        kernel="leap_penalty", L=L, pairs=pairs,
        aligns_per_sec=round(lps), ns_per_pair=round(1e9 / lps, 2),
        issue_bound_ns=round(t_bound * 1e9, 2),
        vs_bound=round((1e9 / lps) / (t_bound * 1e9), 2),
        energy_mean=round(emean, 1), energy_max=emax,
        pass_rate=round(float((passed0 != 0).mean()), 4)))
    print(json.dumps(rows[-1]))

    # ---- fused LEAP-CIGAR (two-pass measured energy bound) ---------
    ccfg = dataclasses.replace(lcfg, leap_max_energy=emax)
    ctile = leap_cigar_tile(ccfg, max_tile=tile)
    if ctile is None:
        rows.append(dict(kernel="leap_cigar", L=L,
                         note=f"history exceeds VMEM at E={emax}"))
        print(json.dumps(rows[-1]))
        return rows
    if ctile != tile:
        print(f"cigar restage at tile {ctile}", file=sys.stderr)
        rc_c = stage_planes_tiled_t(rc, tile=ctile)
        fc_c = stage_planes_tiled_t(fc, tile=ctile)
        nbt_c = chunk // ctile
        cchunks = [
            (jax.device_put(np.ascontiguousarray(rc_c[i: i + nbt_c])),
             jax.device_put(rl[lo: lo + chunk]),
             jax.device_put(np.ascontiguousarray(fc_c[i: i + nbt_c])),
             jax.device_put(fl[lo: lo + chunk]))
            for lo, i in [(c * chunk, c * nbt_c)
                          for c in range(pairs // chunk)]
        ]
        for c in cchunks:
            for a in c:
                force_completion(a)
    else:
        cchunks = chunks
    cfn = jax.jit(functools.partial(
        leap_align_pallas, cfg=ccfg, pre_staged="planes_tiled",
        want_cigar=True, tile=ctile))
    dt, outs = _time_chunks(
        jax.jit(lambda a, b, c, d: cfn(a, b, c, d)["penalty"]),
        cchunks, reps)
    cps = pairs / dt
    rows.append(dict(
        kernel="leap_cigar", L=L, pairs=pairs, aligns_per_sec=round(cps),
        ns_per_pair=round(1e9 / cps, 2), energy_bound=emax,
        tile=ctile))
    print(json.dumps(rows[-1]))
    return rows


def main():
    which = [int(a) for a in sys.argv[1:]] or [256, 512]
    err = float(os.environ.get("LS_ERR", "0.05"))
    reps = int(os.environ.get("LS_REPS", "3"))
    tile = int(os.environ.get("LS_TILE", "2048"))
    for L in which:
        run_length(L, err, reps, tile)


if __name__ == "__main__":
    main()
