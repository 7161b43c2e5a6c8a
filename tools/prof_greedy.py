"""Decompose greedy-pallas step time: XLA prologue vs kernel.

Usage: python tools/prof_greedy.py [n_pairs]
Times, on the real chip:
  A. round-1 prologue (two [L,B] int32 transposes)
  B. current prologue (pack_bitplanes + valid planes + transposes)
  C. transpose-first pack (pack from [L,B] layout, reduce middle axis)
  D. full current step (prologue + kernel)
  E. kernel only (planes precomputed on device, timed separately)
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

from asm_tpu.config import AlignConfig
from asm_tpu.encoding import pack_bitplanes
from asm_tpu.ops.packed import pack_rows
from asm_tpu.utils.corpus_cache import load_corpus


def force(x):
    return np.asarray(jnp.sum(x))


def bench(fn, *args, reps=8):
    fn(*args)  # compile+warm
    force(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        force(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 23
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench_cache", f"corpus_{n}_0.05.npz")
    rc, rl, fc, fl = load_corpus(cache, n=n, err=0.05, mr=0.96, seed=42,
                                 length=100)
    B, L = rc.shape
    W = L // 32
    NB = B // 128
    rc, rl = jnp.asarray(rc), jnp.asarray(rl)
    fc, fl = jnp.asarray(fc), jnp.asarray(fl)
    cfg = AlignConfig(x=1, o=1, e=1, k=3, max_len=128, max_steps=32)

    @jax.jit
    def prologue_r1(rc, fc):
        a = rc.astype(jnp.int32).T.reshape(L, NB, 128)
        b = fc.astype(jnp.int32).T.reshape(L, NB, 128)
        return a[0, 0, 0].astype(jnp.int32) + b[0, 0, 0]

    @jax.jit
    def prologue_now(rc, fc):
        r0, r1 = pack_bitplanes(rc)
        f0, f1 = pack_bitplanes(fc)
        rv = pack_rows(rc < 4)
        fv = pack_rows(fc < 4)
        out = 0
        for p in (r0, r1, rv, f0, f1, fv):
            out = out + p.T.reshape(W, NB, 128)[0, 0, 0].astype(jnp.int32)
        return out

    @jax.jit
    def prologue_tfirst(rc, fc):
        # transpose first, pack with the reduce over the MIDDLE axis so the
        # minor (batch) dim stays 128-lane friendly
        out = 0
        for codes in (rc, fc):
            ct = codes.T.astype(jnp.int32).reshape(W, 32, B)
            sh = jax.lax.broadcasted_iota(jnp.int32, (1, 32, 1), 1)
            p0 = jnp.sum((ct & 1) << sh, axis=1).astype(jnp.uint32)
            p1 = jnp.sum(((ct >> 1) & 1) << sh, axis=1).astype(jnp.uint32)
            pv = jnp.sum((ct < 4).astype(jnp.int32) << sh, axis=1).astype(
                jnp.uint32)
            for p in (p0, p1, pv):
                out = out + p.reshape(W, NB, 128)[0, 0, 0].astype(jnp.int32)
        return out

    from asm_tpu.encoding import pack_planes_t
    from asm_tpu.kernels.greedy_pallas import greedy_align_pallas
    from asm_tpu.parallel.schedule import difficulty_order

    @jax.jit
    def prologue_swar(rc, fc):
        out = 0
        for p in pack_planes_t(rc) + pack_planes_t(fc):
            out = out + p.T.reshape(W, NB, 128)[0, 0, 0].astype(jnp.int32)
        return out

    @jax.jit
    def prologue_swar_notr(rc, fc):
        out = 0
        for p in pack_planes_t(rc) + pack_planes_t(fc):
            out = out + p[0, 0].astype(jnp.int32)
        return out

    @jax.jit
    def full_step(rc, rl, fc, fl):
        return greedy_align_pallas(rc, rl, fc, fl, cfg,
                                   want_cigar=False)["cost"]

    perm = difficulty_order(np.asarray(rc), np.asarray(rl),
                            np.asarray(fc), np.asarray(fl))
    rcs = jnp.asarray(np.asarray(rc)[perm])
    rls = jnp.asarray(np.asarray(rl)[perm])
    fcs = jnp.asarray(np.asarray(fc)[perm])
    fls = jnp.asarray(np.asarray(fl)[perm])

    @jax.jit
    def full_step_sum(rc, rl, fc, fl):
        # ONE dispatch: kernel + checksum (what bench.py times per chunk)
        out = greedy_align_pallas(rc, rl, fc, fl, cfg, want_cigar=False)
        return jnp.sum(out["cost"])

    def bench_scalar(fn, *args, reps=10):
        np.asarray(fn(*args))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    import sys as _sys
    which = _sys.argv[2].split(",") if len(_sys.argv) > 2 else None
    print(f"B={B}")
    for name, fn, args, brun in [
        ("prologue_r1", prologue_r1, (rc, fc), bench),
        ("prologue_swar", prologue_swar, (rc, fc), bench),
        ("prologue_swar_notr", prologue_swar_notr, (rc, fc), bench),
        ("full_step", full_step, (rc, rl, fc, fl), bench),
        ("full_step_sorted", full_step, (rcs, rls, fcs, fls), bench),
        ("step_sum", full_step_sum, (rc, rl, fc, fl), bench_scalar),
        ("step_sum_sorted", full_step_sum, (rcs, rls, fcs, fls),
         bench_scalar),
    ]:
        if which and name not in which:
            continue
        t = brun(fn, *args)
        print(f"{name:18s} {t*1e3:8.2f} ms   {B/t/1e6:7.1f}M pairs/s",
              flush=True)


if __name__ == "__main__":
    main()
