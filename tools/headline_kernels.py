"""One-off headline throughput for LEAP and the NW cascade on the real chip.

Same accounting as bench.py (corpus prep + staging untimed, queued chunk
dispatches, completion forced by pulling a reduced scalar through the axon
tunnel). Prints one JSON line per kernel.

Usage:  python tools/headline_kernels.py [leap leap_cigar leap_gated nw]
Env:    HK_PAIRS (default 8388608), HK_CHUNK (default = pairs),
        HK_REPS (default 3), HK_ERR (corpus error rate, default 0.05),
        HK_CIGAR_CFG (unit | affine — the reference LEAP driver's
        init_affine(…, 2, 3, 1) penalties, LEAP_SIMD/main.cpp:97),
        HK_NW_PARTITION (default 1: measured-band partitioned dispatch;
        0 = whole-chunk auto cascade), HK_NW_CHUNK, HK_SORT.

vs_baseline is computed against the reference's published single-core
time for the SAME error rate (README.md:10-68 tables).
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
import sys
import time

# 8192-pair grid tiles measured fastest for the LEAP family on the v5e
# with the tile-major layout + measured-energy order (leap 707.2M vs
# 697.6M; cigar 506.9M vs 484.7M; gated 779.8M vs 761.8M aligns/s at
# 4096) — must be set before asm_tpu imports, and the two must match
# (the staged block size comes from the greedy module; the LEAP kernel
# sub-tiles it when the CIGAR history needs a smaller grid tile)
os.environ.setdefault("ASM_GREEDY_TILE", "8192")
os.environ.setdefault("ASM_LEAP_TILE", "8192")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from asm_tpu.config import AlignConfig
from asm_tpu.utils.corpus_cache import load_corpus

# reference single-core seconds per 1M alignments at each simulated error
# rate (README.md:10-68); the CIGAR-producing and gated LEAP rows measure
# against the same LEAP baseline (the reference's timed loop never skips
# backtrack state upkeep)
REF_SECONDS = {
    "nw": {0.05: 36.22, 0.10: 34.26, 0.15: 32.33, 0.20: 31.55},
    "leap": {0.05: 1.55, 0.10: 2.89, 0.15: 3.85, 0.20: 4.47},
}


def base_rate(name: str, err: float) -> float:
    kind = "nw" if name.startswith("nw") else "leap"
    tbl = REF_SECONDS[kind]
    key = min(tbl, key=lambda r: abs(r - err))
    return 1e6 / tbl[key]


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))
    n_pairs = int(os.environ.get("HK_PAIRS", 1 << 23))
    chunk = int(os.environ.get("HK_CHUNK", n_pairs))
    reps = int(os.environ.get("HK_REPS", 3))
    err = float(os.environ.get("HK_ERR", 0.05))
    which = sys.argv[1:] or ["leap", "leap_cigar", "nw"]

    cfg = AlignConfig(x=1, o=1, e=1, k=3, max_len=128)
    cache = os.path.join(repo, "bench_cache", f"corpus_{n_pairs}_{err}.npz")
    got = load_corpus(cache, n=n_pairs, err=err, mr=0.96, seed=42,
                      length=100)
    if got is None:
        from asm_tpu.native import generate_dataset_native
        got = generate_dataset_native(n_pairs, 100, err,
                                      mismatch_rate=0.96, seed=42,
                                      max_len=cfg.max_len)
    rc, rl, fc, fl = got
    rl_orig, fl_orig = rl, fl  # unpermuted (sorts re-derive from these)
    print(f"corpus ready: {n_pairs} pairs err={err}", file=sys.stderr)

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

    def run(name, step, chunks, reduce_ix, post=None):
        steps = step if isinstance(step, list) else [step] * len(chunks)
        t0 = time.perf_counter()
        for f, c in zip(steps, chunks):
            int(np.asarray(f(*c)[reduce_ix]))
        print(f"{name} compile+warmup: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
        best = float("inf")
        outs = None
        for r in range(reps):
            outs = None
            t0 = time.perf_counter()
            # in-order device execution: forcing the last chunk is the
            # barrier for all; drain the rest untimed (see bench.py)
            outs = [f(*c) for f, c in zip(steps, chunks)]
            last = int(np.asarray(outs[-1][reduce_ix]))
            dt = time.perf_counter() - t0
            s = sum(int(np.asarray(o[reduce_ix]))
                    for o in outs[:-1]) + last
            best = min(best, dt)
            print(f"{name} rep {r}: {dt:.3f}s  "
                  f"{n_pairs / dt / 1e6:.2f}M aligns/s  (checksum {s})",
                  file=sys.stderr)
        if post is not None:
            post(outs)
        aps = n_pairs / best
        print(json.dumps({
            "metric": f"{name}_alignments_per_sec",
            "value": round(aps, 1), "unit": "aligns/s",
            "vs_baseline": round(aps / base_rate(name, err), 3),
        }))

    if "leap" in which or "leap_cigar" in which or "leap_gated" in which:
        from asm_tpu.kernels.greedy_pallas import _TILE
        from asm_tpu.kernels.greedy_pallas import stage_planes_tiled_t
        from asm_tpu.kernels.leap_pallas import (leap_align_pallas,
                                                 leap_cigar_tile)

        # measured-ENERGY order (HK_RESORT=0 disables): the exact LEAP
        # analogue of the greedy measured-steps cache — a previous run's
        # penalty pass (lv_bag penalty == pass energy) gives the exact
        # order the heuristic difficulty sort approximates, so tiles
        # exit at their own energy instead of their neighbourhood's.
        esort_cache = os.path.join(
            repo, "bench_cache", f"leapsort_{n_pairs}_{err}_v1.npz")
        if int(os.environ.get("HK_RESORT", 1)) and \
                os.path.exists(esort_cache):
            perm = np.load(esort_cache)["perm"]
            from asm_tpu.utils.hostmem import take_rows

            rl, fl = take_rows(rl_orig, perm), take_rows(fl_orig, perm)
            print(f"leap energy-order cache: {esort_cache}",
                  file=sys.stderr)

        t0 = time.perf_counter()
        rc_t = stage_planes_tiled_t(rc, perm=perm)
        fc_t = stage_planes_tiled_t(fc, perm=perm)
        print(f"leap staging: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)

        def make_chunks():
            return [
                (jax.device_put(np.ascontiguousarray(
                     rc_t[i // _TILE:(i + chunk) // _TILE])),
                 jax.device_put(rl[i:i + chunk]),
                 jax.device_put(np.ascontiguousarray(
                     fc_t[i // _TILE:(i + chunk) // _TILE])),
                 jax.device_put(fl[i:i + chunk]))
                for i in range(0, n_pairs, chunk)
            ]

        chunks = make_chunks()

        if int(os.environ.get("HK_RESORT", 1)) and \
                not os.path.exists(esort_cache):
            # measuring pass (untimed): exact penalties -> exact order;
            # restage so THIS run already benefits, and cache the total
            # permutation for the next one
            mbase = jax.jit(functools.partial(
                leap_align_pallas, cfg=cfg, pre_staged="planes_tiled"))

            @jax.jit
            def mstep(a, b, c, d):
                return mbase(a, b, c, d)["penalty"]

            t0 = time.perf_counter()
            pen = np.concatenate([np.asarray(mstep(*c)) for c in chunks])
            order = np.argsort(pen, kind="stable")
            perm = (np.asarray(perm)[order] if perm is not None
                    else order)
            np.savez(esort_cache, perm=perm)
            from asm_tpu.utils.hostmem import take_rows

            rl, fl = take_rows(rl_orig, perm), take_rows(fl_orig, perm)
            rc_t = stage_planes_tiled_t(rc, perm=perm)
            fc_t = stage_planes_tiled_t(fc, perm=perm)
            del chunks
            chunks = make_chunks()
            print(f"leap energy pass+restage: "
                  f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)

        if "leap" in which:
            base = jax.jit(functools.partial(leap_align_pallas, cfg=cfg,
                                             pre_staged="planes_tiled"))

            @jax.jit
            def step(a, b, c, d):
                out = base(a, b, c, d)
                return out, jnp.sum(out["penalty"])

            run("leap", step, chunks, 1)

        if "leap_cigar" in which:
            # CIGAR-producing path at the reference benchmark's
            # af_threshold=200 (benchmark_utils.h:289), energy bound
            # sized by the TWO-PASS scheme (leap_cigar_auto's layout):
            # an untimed penalty pass measures each chunk's max passed
            # energy — for lv_bag the reported penalty IS the pass
            # energy — and the CIGAR pass runs with per-chunk
            # leap_max_energy buckets at the largest VMEM-feasible grid
            # tile. Edit records stay jit-internal like bench.py's
            # greedy step records — the kernel writes them either way;
            # retaining ~GBs of records per queued chunk would OOM.
            name = "leap_cigar"
            pcfg = cfg
            if os.environ.get("HK_CIGAR_CFG", "unit") == "affine":
                # the reference LEAP driver's affine penalties
                # (init_affine(…, ms=2, go=3, ge=1), LEAP_SIMD/main.cpp:97)
                pcfg = AlignConfig(x=2, o=3, e=1, k=3, max_len=128)
                name = "leap_cigar_affine"
            pbase = jax.jit(functools.partial(
                leap_align_pallas, cfg=pcfg, pre_staged="planes_tiled"))

            @jax.jit
            def estep(a, b, c, d):
                out = pbase(a, b, c, d)
                return jnp.max(jnp.where(out["passed"], out["penalty"], 0))

            bucket = 16
            t0 = time.perf_counter()
            bounds = []
            for c in chunks:
                maxe = int(np.asarray(estep(*c)))
                bounds.append(min(pcfg.leap_af_threshold,
                                  max(bucket, -(-maxe // bucket) * bucket)))
            print(f"{name} energy pass: per-chunk bounds {bounds} "
                  f"({time.perf_counter() - t0:.1f}s)", file=sys.stderr)

            def make_cstep(E, tile):
                ccfg = dataclasses.replace(pcfg, leap_max_energy=E)
                cb = jax.jit(functools.partial(
                    leap_align_pallas, cfg=ccfg,
                    pre_staged="planes_tiled", want_cigar=True,
                    tile=tile))

                @jax.jit
                def cstep(a, b, c, d):
                    out = cb(a, b, c, d)
                    pen = out["penalty"]
                    ps = out["passed"]
                    maxp = jnp.max(jnp.where(ps, pen, 0))
                    return (pen, ps), jnp.sum(pen) + 0 * maxp, maxp

                return cstep

            # a chunk whose VMEM-sized grid tile is SMALLER than the
            # staged block would read strided sub-slices (~30% slower,
            # measured); restage those chunks tile-matched instead
            # (untimed prep, one extra staging per distinct tile)
            tiles = []
            for E in bounds:
                t = leap_cigar_tile(dataclasses.replace(
                    pcfg, leap_max_energy=E))
                assert t is not None, (E, "history exceeds VMEM at any "
                                      "tile; use the XLA path")
                tiles.append(t)
            by_tile_stage = {}
            cchunks = list(chunks)
            for i, t in enumerate(tiles):
                if t == _TILE:
                    continue
                if t not in by_tile_stage:
                    t0 = time.perf_counter()
                    by_tile_stage[t] = (
                        stage_planes_tiled_t(rc, perm=perm, tile=t),
                        stage_planes_tiled_t(fc, perm=perm, tile=t),
                    )
                    print(f"{name} restage at tile {t}: "
                          f"{time.perf_counter() - t0:.1f}s",
                          file=sys.stderr)
                rct, fct = by_tile_stage[t]
                # the restage slices whole tile-major blocks: a hand-set
                # HK_CHUNK that is not a multiple of the shrunk tile
                # must fail here with a clear message, not deep in the
                # kernel's staging shape asserts
                assert chunk % t == 0, (
                    f"HK_CHUNK={chunk} is not a multiple of the "
                    f"VMEM-shrunk CIGAR tile {t}")
                lo = i * chunk
                cchunks[i] = (
                    jax.device_put(np.ascontiguousarray(
                        rct[lo // t:(lo + chunk) // t])),
                    jax.device_put(rl[lo:lo + chunk]),
                    jax.device_put(np.ascontiguousarray(
                        fct[lo // t:(lo + chunk) // t])),
                    jax.device_put(fl[lo:lo + chunk]),
                )

            by_bound = {}
            csteps = []
            for E, t in zip(bounds, tiles):
                if (E, t) not in by_bound:
                    by_bound[(E, t)] = make_cstep(E, t)
                csteps.append(by_bound[(E, t)])

            def check(outs):
                maxps = [int(np.asarray(o[2])) for o in outs]
                print(f"{name} max passed energy per chunk: {maxps} "
                      f"(bounds {bounds})", file=sys.stderr)
                for got_, e_ in zip(maxps, bounds):
                    assert got_ <= e_, "energy bound too tight for corpus"

            run(name, csteps, cchunks, 1, post=check)
            del cchunks, by_tile_stage

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
        from asm_tpu.kernels.nw_band import nw_penalty_auto, required_band

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
        def astep(a, b, c, d):
            p = nw_penalty_auto(a, b, c, d, x=cfg.x, o=cfg.o, e=cfg.e,
                                pre_staged=True)
            return p, jnp.sum(p)

        def slice_chunks(rc_s, rl_s, fc_s, fl_s, size):
            return [
                (jax.device_put(np.ascontiguousarray(rc_s[:, i:i + size])),
                 jax.device_put(rl_s[i:i + size]),
                 jax.device_put(np.ascontiguousarray(fc_s[:, i:i + size])),
                 jax.device_put(fl_s[i:i + size]))
                for i in range(0, rl_s.shape[0], size)
            ]

        if not int(os.environ.get("HK_NW_PARTITION", 1)):
            chunks = slice_chunks(rc_t, rl, fc_t, fl, nw_chunk)
            run("nw", astep, chunks, 1)
            return

        # ---- measured-band partitioned dispatch --------------------
        # The whole-chunk cascade re-runs EVERY pair at each band until
        # all certify — at err=0.20 that is 16+32+64 lane-steps per pair
        # where 64 suffice. A measuring pass (the greedy steps-cache
        # trick) records each pair's exact penalty once; required_band
        # turns it into the smallest certifying band, pairs are
        # re-sorted band-major (stable: difficulty order kept within a
        # band), and the timed region dispatches each partition straight
        # to its own banded kernel. Certification is re-proved in-run
        # (reduce index 2); a stale cache drops itself and restarts.
        # NOTE the cache stores bands in the CURRENT corpus order (the
        # difficulty sort, or the leap energy order when a leap section
        # ran first in the same invocation); an order mismatch is caught
        # by the in-run certification assert and self-heals by restart
        band_cache = os.path.join(
            repo, "bench_cache", f"nwbands_{n_pairs}_{err}_v2.npz")
        if os.path.exists(band_cache):
            bands = np.load(band_cache)["bands"]
            print(f"nw band cache: {band_cache}", file=sys.stderr)
        else:
            t0 = time.perf_counter()
            pen = np.concatenate([
                np.asarray(astep(*c)[0])
                for c in slice_chunks(rc_t, rl, fc_t, fl, nw_chunk)
            ])
            bands = required_band(pen, o=cfg.o, e=cfg.e,
                                  bws=(8, 16, 32, 64))
            np.savez(band_cache, bands=bands)
            print(f"nw band pass: {time.perf_counter() - t0:.1f}s "
                  f"dist {dict(zip(*np.unique(bands, return_counts=True)))}",
                  file=sys.stderr)

        key = np.where(bands == 0, 1 << 30, bands.astype(np.int64))
        order = np.argsort(key, kind="stable")
        perm2 = (np.asarray(perm)[order] if perm is not None else order)
        t0 = time.perf_counter()
        rc_t = stage_planes_t(rc, perm=perm2)
        fc_t = stage_planes_t(fc, perm=perm2)
        rl2, fl2 = rl[order], fl[order]
        bands2 = bands[order]
        print(f"nw band restage: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)

        # the SHARED production dispatch plan (asm_tpu.kernels.nw_dispatch)
        # — the same entry point the bench harness's sweep sections time,
        # so both artifacts measure one NW policy (VERDICT r4 #6)
        from asm_tpu.kernels.nw_dispatch import nw_partition_plan

        plan = nw_partition_plan(
            rc_t, rl2, fc_t, fl2, bands2, x=cfg.x, o=cfg.o, e=cfg.e,
            bws=(8, 16, 32, 64), max_chunk=nw_chunk, pre_staged=True,
            already_sorted=True)
        steps, chunks = plan.steps, plan.chunks
        print(f"nw partitions: {plan.partitions} "
              f"-> {len(chunks)} dispatches", file=sys.stderr)

        def check(outs):
            ok = all(bool(np.asarray(o[2])) for o in outs)
            if not ok:
                print("nw band cache stale (uncertified partition); "
                      f"dropping {band_cache} and restarting",
                      file=sys.stderr)
                os.remove(band_cache)
                os.execv(sys.executable, [sys.executable] + sys.argv)

        run("nw", steps, chunks, 1, post=check)


if __name__ == "__main__":
    main()
