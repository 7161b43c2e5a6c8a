"""One-off headline throughput for LEAP and the NW cascade on the real chip.

Same accounting as bench.py (corpus prep + staging untimed, queued chunk
dispatches, completion forced by pulling a reduced scalar through the axon
tunnel). Prints one JSON line per kernel.

Usage:  python tools/headline_kernels.py [leap nw]
Env:    HK_PAIRS (default 8388608), HK_CHUNK (default = pairs),
        HK_REPS (default 3)
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

# 4096-pair grid tiles measured fastest on the v5e with the tile-major
# layout (leap 541.9M vs 490.0M; gated 698.0M vs 654.1M; cigar 375.0M
# vs 286.7M aligns/s) — must be set before asm_tpu imports
os.environ.setdefault("ASM_GREEDY_TILE", "4096")
os.environ.setdefault("ASM_LEAP_TILE", "4096")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from asm_tpu.config import AlignConfig
from asm_tpu.utils.corpus_cache import load_corpus

# reference single-core numbers (BASELINE.md); leap_cigar measures the
# CIGAR-producing path against the same LEAP baseline (the reference's
# timed loop never skips backtrack state upkeep)
BASE = {"leap": 0.65e6, "leap_cigar": 0.65e6, "leap_gated": 0.65e6,
        "nw": 27.6e3}


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))
    n_pairs = int(os.environ.get("HK_PAIRS", 1 << 23))
    chunk = int(os.environ.get("HK_CHUNK", n_pairs))
    reps = int(os.environ.get("HK_REPS", 3))
    which = sys.argv[1:] or ["leap", "leap_cigar", "nw"]

    cfg = AlignConfig(x=1, o=1, e=1, k=3, max_len=128)
    cache = os.path.join(repo, "bench_cache", f"corpus_{n_pairs}_0.05.npz")
    got = load_corpus(cache, n=n_pairs, err=0.05, mr=0.96, seed=42,
                      length=100)
    if got is None:
        from asm_tpu.native import generate_dataset_native
        got = generate_dataset_native(n_pairs, 100, 0.05,
                                      mismatch_rate=0.96, seed=42,
                                      max_len=cfg.max_len)
    rc, rl, fc, fl = got
    print(f"corpus ready: {n_pairs} pairs", file=sys.stderr)

    # difficulty-ordered scheduling, as in bench.py: LEAP tiles exit at
    # their own max energy, so grouping similar pairs stops every tile
    # paying the corpus-wide worst case (~46 energy levels in the tail).
    # Untimed corpus prep; all reported sums are permutation-invariant.
    # HK_SORT=0 disables.
    perm = None
    if int(os.environ.get("HK_SORT", 1)):
        from asm_tpu.parallel import difficulty_order
        from asm_tpu.utils.hostmem import take_rows

        t0 = time.perf_counter()
        perm = difficulty_order(rc, rl, fc, fl)
        rl, fl = take_rows(rl, perm), take_rows(fl, perm)
        print(f"difficulty sort: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)

    def run(name, step, chunks, reduce_ix):
        t0 = time.perf_counter()
        for c in chunks:
            int(np.asarray(step(*c)[reduce_ix]))
        print(f"{name} compile+warmup: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
        best = float("inf")
        for r in range(reps):
            t0 = time.perf_counter()
            # in-order device execution: forcing the last chunk is the
            # barrier for all; drain the rest untimed (see bench.py)
            outs = [step(*c) for c in chunks]
            last = int(np.asarray(outs[-1][reduce_ix]))
            dt = time.perf_counter() - t0
            s = sum(int(np.asarray(o[reduce_ix]))
                    for o in outs[:-1]) + last
            best = min(best, dt)
            print(f"{name} rep {r}: {dt:.3f}s  "
                  f"{n_pairs / dt / 1e6:.2f}M aligns/s  (checksum {s})",
                  file=sys.stderr)
        aps = n_pairs / best
        print(json.dumps({
            "metric": f"{name}_alignments_per_sec",
            "value": round(aps, 1), "unit": "aligns/s",
            "vs_baseline": round(aps / BASE[name], 3),
        }))

    if "leap" in which or "leap_cigar" in which or "leap_gated" in which:
        from asm_tpu.kernels.greedy_pallas import _TILE
        from asm_tpu.kernels.greedy_pallas import stage_planes_tiled_t
        from asm_tpu.kernels.leap_pallas import leap_align_pallas

        t0 = time.perf_counter()
        rc_t = stage_planes_tiled_t(rc, perm=perm)
        fc_t = stage_planes_tiled_t(fc, perm=perm)
        print(f"leap staging: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
        chunks = [
            (jax.device_put(np.ascontiguousarray(
                 rc_t[i // _TILE:(i + chunk) // _TILE])),
             jax.device_put(rl[i:i + chunk]),
             jax.device_put(np.ascontiguousarray(
                 fc_t[i // _TILE:(i + chunk) // _TILE])),
             jax.device_put(fl[i:i + chunk]))
            for i in range(0, n_pairs, chunk)
        ]

        if "leap" in which:
            base = jax.jit(functools.partial(leap_align_pallas, cfg=cfg,
                                             pre_staged="planes_tiled"))

            @jax.jit
            def step(a, b, c, d):
                out = base(a, b, c, d)
                return out, jnp.sum(out["penalty"])

            run("leap", step, chunks, 1)

        if "leap_cigar" in which:
            # CIGAR-producing path: the fused in-kernel backtrack emits
            # packed edit records (decoded host-side by leap_cigar_decode);
            # records stay jit-internal like bench.py's greedy step
            # records — the kernel writes them either way
            # 48 covers this tool's fixed corpus (max passed energy 46; the
            # assert below proves it) and keeps the VMEM history + record
            # writeback small — raise for other corpora
            E = int(os.environ.get("HK_LEAP_E", 48))
            ccfg = AlignConfig(x=1, o=1, e=1, k=3, max_len=128,
                               leap_max_energy=E)
            cbase = jax.jit(functools.partial(
                leap_align_pallas, cfg=ccfg, pre_staged="planes_tiled",
                want_cigar=True))

            @jax.jit
            def cstep(a, b, c, d):
                out = cbase(a, b, c, d)
                pen = out["penalty"]
                ps = out["passed"]
                # fold the truncation proof into the same dispatch
                maxp = jnp.max(jnp.where(ps, pen, 0))
                # do NOT retain edit_rec: as a jit-internal temp the
                # ~4-5 GB/chunk record buffer lives only while its chunk
                # executes (the kernel writes it either way); retaining
                # it OOMs two queued 33.6M chunks
                return (pen, ps), jnp.sum(pen) + 0 * maxp, maxp

            run("leap_cigar", cstep, chunks, 1)
            maxp = max(int(np.asarray(cstep(*c)[2])) for c in chunks)
            print(f"leap_cigar max passed energy: {maxp} (bound {E})",
                  file=sys.stderr)
            assert maxp <= E, "leap_max_energy bound too tight for corpus"

        if "leap_gated" in which:
            # SHD-gated SIMD_ED-levenshtein filter, gate IN-KERNEL (one
            # fused kernel per chunk — the reference gates inside run(),
            # SIMD_ED.cpp:270); init_levenshtein(k=3) semantics
            gcfg = AlignConfig(x=1, o=1, e=1, k=3, leap_af_threshold=3,
                               max_len=128)
            gbase = jax.jit(functools.partial(
                leap_align_pallas, cfg=gcfg, pre_staged="planes_tiled",
                semantics="simd_ed_lev", use_shd_gate=True))

            @jax.jit
            def gstep(a, b, c, d):
                out = gbase(a, b, c, d)
                return out["passed"], jnp.sum(out["penalty"]) + jnp.sum(
                    out["passed"])

            run("leap_gated", gstep, chunks, 1)
        del chunks

    if "nw" in which:
        from asm_tpu.kernels.greedy_pallas import stage_planes_t
        from asm_tpu.kernels.nw_band import nw_penalty_auto

        # the cascade consumes the shared pre-staged 2-bit-plane corpus
        # (64 B/pair on device instead of 256 B of codes + transposed
        # copies), which is what lifts the old 2M-pair chunk cap
        nw_chunk = int(os.environ.get("HK_NW_CHUNK", chunk))
        t0 = time.perf_counter()
        rc_t = stage_planes_t(rc, perm=perm)  # rl/fl already permuted
        fc_t = stage_planes_t(fc, perm=perm)
        print(f"nw staging: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)

        @jax.jit
        def step(a, b, c, d):
            p = nw_penalty_auto(a, b, c, d, x=cfg.x, o=cfg.o, e=cfg.e,
                                pre_staged=True)
            return p, jnp.sum(p)

        chunks = [
            (jax.device_put(np.ascontiguousarray(rc_t[:, i:i + nw_chunk])),
             jax.device_put(rl[i:i + nw_chunk]),
             jax.device_put(np.ascontiguousarray(fc_t[:, i:i + nw_chunk])),
             jax.device_put(fl[i:i + nw_chunk]))
            for i in range(0, n_pairs, nw_chunk)
        ]
        run("nw", step, chunks, 1)


if __name__ == "__main__":
    main()
