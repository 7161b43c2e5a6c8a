"""Long-sequence headline rows (VERDICT r4 item #3).

The reference hard-caps reads at 128 chars (GASMA/utils.h:24) or 256
(LEAP_SIMD/LV_BAG.h:18); this framework's max_len is configuration.
Round 4 proved L=256/512 CORRECT (tests/test_long_sequences.py); this
tool proves they run AT SPEED: greedy and LEAP penalty throughput on
multi-million-pair corpora at L=256 and L=512, with the roofline
issue-bound context (vreg-ops/pair scales ~linearly with the word
count W = L/32, so the expected aligns/s is the L=128 headline scaled
by ~128/L).

Method mirrors the L=128 headline pipeline: a PROBE pass measures each
pair's greedy step count / LEAP passed energy, the corpus is re-staged
in measured order (same-cost pairs share grid tiles, so the per-tile
loop max tracks the mean instead of the corpus max — the bench.py
steps-cache / leapsort trick), and the greedy steps bound is sized
from the measured max. CIGAR production at long L is FULLY FUSED too:
round 5 added 16-bit "wide" backtrack cells, so the fused LEAP-CIGAR
kernel runs at any max_len; the energy-sorted corpus takes per-chunk
measured energy bounds, and a chunk whose bound exceeds VMEM at the
Mosaic-minimum 1024 tile is SPLIT at the deepest fitting bound
(plan_cigar_chunks): its energy-sorted prefix stays fused; only the
energy>E_fit residue rides the XLA history kernel inside the same
timed wall (0.02% of pairs at L=512 — the split took that row
30.3 -> 45.9M aligns/s).

Corpora are sized to constant total bases (pairs x L ~= 2.1 G):
L=256 -> 8M pairs, L=512 -> 4M pairs, err=0.05.

Env: LS_TILE (grid tile, default 2048), LS_PAIRS_BASE (default 2^23 at
L=256, halved per doubling), LS_ERR (default 0.05), LS_REPS (default 3),
LS_KERNELS (comma subset of greedy,leap,cigar — default all),
LS_GREEDY_CHUNKS (steps-bound granularity, default 16 chunks).
Usage (on the TPU): python tools/longseq_headline.py [256 512]
"""

from __future__ import annotations

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
# microkernels, round 4): vector-issue peak
VPU_VREG_OPS = 3.34e9


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


def _slope_rate(fn, chunks, reps, chunk_pairs):
    """Two-point-slope per-pair rate: the axon tunnel's ~25 ms fixed
    dispatch floor is a constant offset at both sizes, so the slope
    between the full and half corpus isolates the kernel's own
    per-pair time (round-4 lesson: microbenchmark with two workload
    sizes). Returns (full-wall rate, slope rate); slope None when the
    corpus is a single chunk."""
    t_full, _ = _time_chunks(fn, chunks, reps)
    if len(chunks) < 2:
        return t_full, None
    half = chunks[: len(chunks) // 2]
    t_half, _ = _time_chunks(fn, half, reps)
    dpairs = (len(chunks) - len(half)) * chunk_pairs
    return t_full, dpairs / (t_full - t_half)


def _counts(kernel_partial, args, loop_iters):
    from tools.roofline import count_jaxpr, find_pallas_jaxprs

    jx = jax.make_jaxpr(kernel_partial)(*args)
    kj = find_pallas_jaxprs(jx.jaxpr)
    assert kj, "no pallas_call found"
    kj0 = getattr(kj[0], "jaxpr", kj[0])
    return count_jaxpr(kj0, loop_iters)


def _stage_chunks(rc, rl, fc, fl, tile, chunk, perm=None):
    from asm_tpu.kernels.greedy_pallas import stage_planes_tiled_t

    rc_t = stage_planes_tiled_t(rc, tile=tile, perm=perm)
    fc_t = stage_planes_tiled_t(fc, tile=tile, perm=perm)
    rl2 = rl if perm is None else rl[perm]
    fl2 = fl if perm is None else fl[perm]
    pairs = rl2.shape[0]
    nbt = chunk // tile
    chunks = [
        (jax.device_put(np.ascontiguousarray(rc_t[i: i + nbt])),
         jax.device_put(rl2[lo: lo + chunk]),
         jax.device_put(np.ascontiguousarray(fc_t[i: i + nbt])),
         jax.device_put(fl2[lo: lo + chunk]))
        for lo, i in [(c * chunk, c * nbt)
                      for c in range(pairs // chunk)]
    ]
    for c in chunks:
        for a in c:
            force_completion(a)
    return chunks


def plan_cigar_chunks(energy_sorted, lcfg, tile, csize):
    """Fused-CIGAR dispatch plan over an ENERGY-SORTED corpus.

    Returns (plans, split_specs, xla_spans, E_fit, t_fit):
      plans       — [(base, Eb, t_c)]: whole csize-chunks fused at their
                    own bucketized energy bound Eb (multiple of 8,
                    capped at the af threshold) and VMEM-sized tile t_c;
      split_specs — [(base, plen)]: for chunks whose own bound exceeds
                    VMEM even at the Mosaic-minimum 1024 tile, the
                    energy-sorted PREFIX with energy <= E_fit (rounded
                    down to t_fit) that still rides the fused kernel at
                    (E_fit, t_fit);
      xla_spans   — [(lo, hi)]: the true deep residue (energy > E_fit)
                    for the XLA history path;
      E_fit/t_fit — the deepest bucketized bound that fits VMEM at some
                    tile, and that tile (None/None if nothing fits).

    Every pair index in [0, len) is covered exactly once. Pure host
    logic (unit-tested in tests/test_longseq_plan.py)."""
    import dataclasses

    from asm_tpu.kernels.leap_pallas import leap_cigar_tile

    af = lcfg.leap_af_threshold
    pairs = len(energy_sorted)
    assert pairs % csize == 0
    E_fit = t_fit = None
    for Ef in range(min(af, -(-af // 8) * 8), 7, -8):
        tf = leap_cigar_tile(
            dataclasses.replace(lcfg, leap_max_energy=Ef), max_tile=tile)
        if tf is not None:
            E_fit, t_fit = Ef, tf
            break
    plans = []
    split_specs = []  # (base, plen) fused prefixes of over-VMEM chunks
    xla_spans = []
    for base in range(0, pairs, csize):
        Ec = int(min(energy_sorted[base: base + csize].max(), af))
        Eb = min(af, -(-max(Ec, 8) // 8) * 8)  # bucket to multiples of 8
        t_c = leap_cigar_tile(
            dataclasses.replace(lcfg, leap_max_energy=Eb), max_tile=tile)
        if t_c is None:
            sub = energy_sorted[base: base + csize]
            plen = int(np.searchsorted(sub, E_fit, side="right")) \
                if E_fit is not None else 0
            plen -= plen % (t_fit or 1)
            if plen:
                split_specs.append((base, plen))
            if plen < csize:
                xla_spans.append((base + plen, base + csize))
        else:
            plans.append((base, Eb, t_c))
    return plans, split_specs, xla_spans, E_fit, t_fit


def run_length(L, err, reps, tile):
    from asm_tpu.kernels.greedy_pallas import greedy_align_pallas
    from asm_tpu.kernels.leap_pallas import leap_align_pallas
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

    chunk = min(pairs, 1 << 22)
    if pairs // chunk < 2:  # >= 2 chunks so the slope rate exists
        chunk = pairs // 2
    assert pairs % chunk == 0 and chunk % tile == 0
    t0 = time.perf_counter()
    chunks0 = _stage_chunks(rc, rl, fc, fl, tile, chunk)
    print(f"probe staging: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    rows = []
    kernels = os.environ.get("LS_KERNELS", "greedy,leap,cigar"
                             ).split(",")

    if "greedy" in kernels:
        # ---- greedy: probe steps at a generous bound (VMEM-friendlier
        # than the max_len-safe bound; escalate if the probe saturates),
        # then re-stage in measured-steps order and size the bound from
        # the measured max
        probe_bound = min(L, 256)
        while True:
            pcfg = AlignConfig(x=1, o=1, e=1, k=3, max_len=L,
                               max_steps=probe_bound)
            pfn = jax.jit(lambda a, b, c, d: functools.partial(
                greedy_align_pallas, cfg=pcfg, want_cigar=False,
                pre_staged="planes_tiled")(a, b, c, d)["steps"])
            steps = np.concatenate([np.asarray(pfn(*c)) for c in chunks0])
            if int(steps.max()) < probe_bound or probe_bound >= L:
                break
            probe_bound = min(L, probe_bound * 2)
            print(f"probe saturated; retrying at bound {probe_bound}",
                  file=sys.stderr)
        smax, smean = int(steps.max()), float(steps.mean())
        order = np.argsort(steps, kind="stable")
        steps_sorted = steps[order]
        # per-chunk pow2 steps bounds (bench.py's quantized-bounds trick:
        # the sorted corpus gives early chunks tiny record buffers; the
        # bound only sizes records — the loop already exits per tile).
        # Bound granularity is FINER than the dispatch-slope chunk
        # (default pairs/16, env LS_GREEDY_CHUNKS): only the deepest
        # slice pays the max-steps record buffer (its zero-init +
        # writeback is the residual vs the mean-trip issue bound).
        gsize = max(tile, pairs // int(os.environ.get(
            "LS_GREEDY_CHUNKS", "16")))
        assert pairs % gsize == 0 and gsize % tile == 0
        bounds = [
            max(8, 1 << int(steps_sorted[i: i + gsize].max()).bit_length())
            for i in range(0, pairs, gsize)
        ]
        t0 = time.perf_counter()
        gchunks = _stage_chunks(rc, rl, fc, fl, tile, gsize, perm=order)
        print(f"greedy steps probe: max {smax} mean {smean:.1f} "
              f"bounds {bounds}; restage {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
        gfns = {}
        for b in set(bounds):
            gcfg = AlignConfig(x=1, o=1, e=1, k=3, max_len=L, max_steps=b)
            gfns[b] = jax.jit(functools.partial(
                lambda a, b_, c, d, _cfg: greedy_align_pallas(
                    a, b_, c, d, _cfg, want_cigar=False,
                    pre_staged="planes_tiled")["cost"], _cfg=gcfg))
        gcall = list(zip((gfns[b] for b in bounds), gchunks))
        for b in set(bounds):  # compile each program outside the timing
            force_completion(gfns[b](*gchunks[bounds.index(b)]))

        best = None
        half = len(gcall) // 2
        for _ in range(reps):
            t0 = time.perf_counter()
            outs = [fn(*c) for fn, c in gcall]
            force_completion(outs[-1])
            dt_full = time.perf_counter() - t0
            best = dt_full if best is None or dt_full < best else best
        dt = best
        slope = None
        if half:
            bhalf = None
            for _ in range(reps):
                t0 = time.perf_counter()
                outs_h = [fn(*c) for fn, c in gcall[:half]]
                force_completion(outs_h[-1])
                d = time.perf_counter() - t0
                bhalf = d if bhalf is None or d < bhalf else bhalf
            slope = (len(gcall) - half) * gsize / (dt - bhalf)
        outs = [fn(*c) for fn, c in gcall]
        checksum = sum(int(np.asarray(o).sum()) for o in outs)
        bound = max(bounds)
        gps = pairs / dt
        count_cfg = AlignConfig(x=1, o=1, e=1, k=3, max_len=L,
                                max_steps=max(bounds))
        cnt = _counts(functools.partial(
            greedy_align_pallas, cfg=count_cfg, want_cigar=False,
            pre_staged="planes_tiled"), gchunks[0], [max(smean - 1, 0)])
        t_bound = (sum(cnt.values()) / tile) / VPU_VREG_OPS
        rows.append(dict(
            kernel="greedy", L=L, pairs=pairs, aligns_per_sec=round(gps),
            slope_aligns_per_sec=round(slope) if slope else None,
            ns_per_pair=round(1e9 / gps, 2),
            slope_ns_per_pair=round(1e9 / slope, 2) if slope else None,
            issue_bound_ns=round(t_bound * 1e9, 2),
            vs_bound=round((1e9 / (slope or gps)) / (t_bound * 1e9), 2),
            steps_mean=round(smean, 1), steps_max=smax, steps_bound=bound,
            chunk_bounds=sorted(set(bounds)), checksum=checksum))
        print(json.dumps(rows[-1]))
        del gchunks

    # ---- LEAP penalty: probe energies, re-stage in measured-energy
    # order (leapsort trick)
    lcfg = AlignConfig(x=1, o=1, e=1, k=3, max_len=L)
    lpart = functools.partial(leap_align_pallas, cfg=lcfg,
                              pre_staged="planes_tiled")
    efn = jax.jit(lambda a, b, c, d: (
        (lambda r: (r["passed"], r["penalty"]))(lpart(a, b, c, d))))
    outs = [efn(*c) for c in chunks0]
    passed = np.concatenate([np.asarray(o[0]) for o in outs])
    pen = np.concatenate([np.asarray(o[1]) for o in outs])
    emax = int(pen[passed != 0].max())
    emean = float(pen[passed != 0].mean())
    energy = np.where(passed != 0, pen, np.int32(1 << 20))
    order = np.argsort(energy, kind="stable")
    del chunks0
    if "leap" in kernels:
        t0 = time.perf_counter()
        lchunks = _stage_chunks(rc, rl, fc, fl, tile, chunk, perm=order)
        print(f"leap energy probe: max {emax} mean {emean:.1f}; "
              f"restage {time.perf_counter() - t0:.1f}s", file=sys.stderr)
        lfn = jax.jit(lambda a, b, c, d: lpart(a, b, c, d)["penalty"])
        force_completion(lfn(*lchunks[0]))
        dt, slope = _slope_rate(lfn, lchunks, reps, chunk)
        lps = pairs / dt
        cnt = _counts(lpart, lchunks[0], [emean / 2])  # 2 levels/iteration
        t_bound = (sum(cnt.values()) / tile) / VPU_VREG_OPS
        rows.append(dict(
            kernel="leap_penalty", L=L, pairs=pairs,
            aligns_per_sec=round(lps),
            slope_aligns_per_sec=round(slope) if slope else None,
            ns_per_pair=round(1e9 / lps, 2),
            slope_ns_per_pair=round(1e9 / slope, 2) if slope else None,
            issue_bound_ns=round(t_bound * 1e9, 2),
            vs_bound=round((1e9 / (slope or lps)) / (t_bound * 1e9), 2),
            energy_mean=round(emean, 1), energy_max=emax,
            pass_rate=round(float((passed != 0).mean()), 4)))
        print(json.dumps(rows[-1]))

    if "cigar" in kernels:
        # ---- fused LEAP-CIGAR (per-chunk measured energy bounds; round-5
        # 16-bit "wide" cell packing lifts the old max_len<=224 cap).
        # The corpus is ENERGY-SORTED, so per-chunk maxima are monotone:
        # most chunks ride the fused kernel at their own (bucketized) energy
        # bound + VMEM-sized tile; a chunk whose bound exceeds VMEM even at
        # the Mosaic-minimum 1024 tile (the deep-energy tail) falls back to
        # the XLA history kernel — same CIGAR records, device-side, just
        # without the fused backtrack. CIGAR decode is host-side for both
        # paths and excluded, as in the L=128 headline.
        import dataclasses

        from asm_tpu.kernels.leap import leap_align

        csize = max(tile, min(chunk, pairs // 16))
        energy_sorted = energy[order]
        plans, split_specs, xla_spans, E_fit, t_fit = plan_cigar_chunks(
            energy_sorted, lcfg, tile, csize)
        by_tile = {}
        for t_c in {t for _, _, t in plans}:
            by_tile[t_c] = _stage_chunks(rc, rl, fc, fl, t_c, csize,
                                         perm=order)
        fns = {}
        calls = []
        for (base, Eb, t_c) in plans:
            key = (Eb, t_c)
            if key not in fns:
                ccfg = dataclasses.replace(lcfg, leap_max_energy=Eb)
                fns[key] = jax.jit(functools.partial(
                    lambda a, b, c, d, _cfg, _t: leap_align_pallas(
                        a, b, c, d, _cfg, pre_staged="planes_tiled",
                        want_cigar=True, tile=_t)["penalty"],
                    _cfg=ccfg, _t=t_c))
            calls.append((fns[key], by_tile[t_c][base // csize]))
        # fused prefixes of split chunks: gather the prefix rows (the perm
        # path needs a full-corpus permutation) and stage at the fit tile
        from asm_tpu.kernels.greedy_pallas import stage_planes_tiled_t
        for base, plen in split_specs:
            key = (E_fit, t_fit)
            if key not in fns:
                ccfg = dataclasses.replace(lcfg, leap_max_energy=E_fit)
                fns[key] = jax.jit(functools.partial(
                    lambda a, b, c, d, _cfg, _t: leap_align_pallas(
                        a, b, c, d, _cfg, pre_staged="planes_tiled",
                        want_cigar=True, tile=_t)["penalty"],
                    _cfg=ccfg, _t=t_fit))
            idx = order[base: base + plen]
            args = (jax.device_put(stage_planes_tiled_t(rc[idx], tile=t_fit)),
                    jax.device_put(rl[idx]),
                    jax.device_put(stage_planes_tiled_t(fc[idx], tile=t_fit)),
                    jax.device_put(fl[idx]))
            for a in args:
                force_completion(a)
            calls.append((fns[key], args))
        # XLA residue: raw codes, sub-chunked to bound the history tables
        xn = sum(hi - lo for lo, hi in xla_spans)
        xfn = jax.jit(functools.partial(
            lambda a, b, c, d, _cfg: leap_align(
                a, b, c, d, _cfg, want_history=True)["penalty"],
            _cfg=lcfg))
        xcalls = []
        for lo, hi in xla_spans:
            for s in range(lo, hi, 1 << 16):
                e_ = min(s + (1 << 16), hi)
                idx = order[s:e_]
                xcalls.append((xfn, (jnp.asarray(rc[idx]),
                                     jnp.asarray(rl[idx]),
                                     jnp.asarray(fc[idx]),
                                     jnp.asarray(fl[idx]))))
        print(f"cigar plan: {len(calls)} fused chunks "
              f"(bounds/tiles {sorted(set((e, t) for _, e, t in plans))}, "
              f"{len(split_specs)} split prefixes at ({E_fit}, {t_fit})), "
              f"{xn} pairs via the XLA history path", file=sys.stderr)
        for fn, args in {id(f): (f, a) for f, a in calls + xcalls}.values():
            force_completion(fn(*args))  # compile every program untimed
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            outs = [fn(*args) for fn, args in calls + xcalls]
            force_completion(outs[-1])  # in-order queue: last is the barrier
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        cps = pairs / best
        rows.append(dict(
            kernel="leap_cigar", L=L, pairs=pairs,
            aligns_per_sec=round(cps), ns_per_pair=round(1e9 / cps, 2),
            energy_max=emax, fused_chunks=len(calls), xla_pairs=int(xn),
            wide_cells=L > 253))
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
