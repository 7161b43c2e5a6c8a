"""One-off experiment: quantify lockstep-loop waste in the greedy pallas
kernel — per-tile max steps vs per-pair mean, sorted vs unsorted — plus
an all-easy (err=0) lower bound that isolates the fixed build cost.

Usage: python tools/exp_sched.py  (on the TPU chip; uses the bench cache)
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
jax.config.update("jax_compilation_cache_dir", os.path.join(_ROOT, ".jax_cache"))

from asm_tpu.config import AlignConfig
from asm_tpu.kernels.greedy_pallas import greedy_align_pallas, _TILE
from asm_tpu.parallel.schedule import difficulty_order
from asm_tpu.utils.corpus_cache import load_corpus


def timed(fn, *args, reps=3):
    out = fn(*args)
    s = int(np.asarray(out[1]))  # barrier
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        s = int(np.asarray(out[1]))
        best = min(best, time.perf_counter() - t0)
    return best, s, out


def main():
    n = int(os.environ.get("N", 1 << 23))
    cfg = AlignConfig(x=1, o=1, e=1, k=3, max_len=128)
    rc, rl, fc, fl = load_corpus(
        os.path.join(_ROOT, "bench_cache", f"corpus_{n}_0.05.npz")
    )

    @jax.jit
    def step(rc, rl, fc, fl):
        out = greedy_align_pallas(rc, rl, fc, fl, cfg, want_cigar=False)
        # tile-wise max steps [n/_TILE] stays tiny on the wire
        tm = out["steps"].reshape(-1, _TILE).max(axis=1)
        return tm, jnp.sum(out["cost"]), out["steps"]

    for name, perm in [
        ("unsorted", None),
        ("sorted", difficulty_order(rc, rl, fc, fl)),
    ]:
        if perm is None:
            a = (jnp.asarray(rc), jnp.asarray(rl), jnp.asarray(fc), jnp.asarray(fl))
        else:
            a = (jnp.asarray(rc[perm]), jnp.asarray(rl[perm]),
                 jnp.asarray(fc[perm]), jnp.asarray(fl[perm]))
        dt, chk, out = timed(step, *a)
        tm = np.asarray(out[0])
        steps = np.asarray(out[2])
        print(
            f"{name:9s} {dt:.3f}s {n/dt/1e6:7.1f}M/s  checksum={chk}  "
            f"steps mean={steps.mean():.2f} p50={np.median(steps):.0f} "
            f"max={steps.max()}  tile-max mean={tm.mean():.2f}",
            flush=True,
        )

    # all-easy lower bound: identical read/ref (steps==1 everywhere)
    rc0 = rc.copy(); fl0 = rl.copy()
    fc0 = np.full_like(fc, 5)
    fc0[:, :] = 5
    m = np.arange(fc.shape[1])[None, :] < rl[:, None]
    fc0[m] = rc0[m & (np.arange(rc.shape[1])[None, :] < 128)]
    a = (jnp.asarray(rc0), jnp.asarray(rl), jnp.asarray(fc0), jnp.asarray(fl0))
    dt, chk, out = timed(step, *a)
    tm = np.asarray(out[0])
    print(
        f"{'all-easy':9s} {dt:.3f}s {n/dt/1e6:7.1f}M/s  checksum={chk} "
        f"(expect 0)  tile-max mean={tm.mean():.2f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
