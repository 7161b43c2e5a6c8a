"""Roofline for the flagship fused kernels (VERDICT r3 weak #6).

Three measurements, one report:

1. EMPIRICAL VPU peak — a Pallas microkernel issuing long chains of
   independent int32 vector ops from VMEM scratch (8 independent
   accumulator streams x unrolled adds/xors, no loads/stores in the
   steady state). This measures the achievable vector-issue rate on THIS
   chip through THIS toolchain — no spec-sheet guessing.
2. EMPIRICAL HBM stream rate — a Pallas kernel that reads its input
   block and folds it into one vreg accumulator (the pure-input probe,
   cf. the round-3 layout experiments).
3. STATIC op counts for the greedy/LEAP kernels — the pallas_call jaxpr
   is walked recursively; every vector eqn is charged
   ceil(elems / (8*128)) vreg-ops (int32 lane units), with while-loop
   bodies multiplied by the measured average trip count. Categories:
   arith / shift / popcount / select-compare / memory.

Roofline: time_pred = max(vreg_ops / vpu_peak, bytes / hbm_rate)
against the measured per-pair kernel time. The gap factor says how much
headroom optimization could still buy (1.0 = at the wall).

Usage: python tools/roofline.py [greedy leap micro]   (on the TPU)
"""

from __future__ import annotations

import functools
import json
import math
import os
import sys
import time

os.environ.setdefault("ASM_GREEDY_TILE", "4096")
os.environ.setdefault("ASM_LEAP_TILE", "4096")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------- micro
def vpu_peak_measure(iters=4_000_000, streams=8, unroll=4, reps=5):
    """Measured int32 vector-issue rate (vreg-ops/s, one (8,128) int32
    op = 1 vreg-op). Independent accumulator streams hide latency.
    Two-point slope (iters vs 2*iters) cancels the ~25 ms tunnel
    roundtrip and any fixed dispatch overhead exactly."""

    def make(n):
        def kernel(x_ref, o_ref, acc):
            for s in range(streams):
                acc[s] = x_ref[...] + s

            def body(i, _):
                for s in range(streams):
                    v = acc[s]
                    for _ in range(unroll):
                        v = v + jnp.int32(1)
                        v = v ^ jnp.int32(12345)
                    acc[s] = v
                return 0

            jax.lax.fori_loop(0, n, body, 0, unroll=False)
            out = acc[0]
            for s in range(1, streams):
                out = out ^ acc[s]
            o_ref[...] = out

        return jax.jit(pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            scratch_shapes=[pltpu.VMEM((streams, 8, 128), jnp.int32)],
        ))

    x = jnp.zeros((8, 128), jnp.int32)
    walls = []
    for n in (iters, 2 * iters):
        fn = make(n)
        int(np.asarray(fn(x)).sum())  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            int(np.asarray(fn(x)).sum())
            best = min(best, time.perf_counter() - t0)
        walls.append(best)
    ops = iters * streams * unroll * 2  # ops in the SLOPE region
    dt = max(walls[1] - walls[0], 1e-9)
    return ops / dt, walls, dispatch_floor()


_FLOOR = None


def dispatch_floor(reps=5):
    """Empty-dispatch wall time (the tunnel roundtrip)."""
    global _FLOOR
    if _FLOOR is not None:
        return _FLOOR
    x = jnp.zeros((8, 128), jnp.int32)
    f = jax.jit(lambda a: jnp.sum(a))
    int(np.asarray(f(x)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        int(np.asarray(f(x)))
        best = min(best, time.perf_counter() - t0)
    _FLOOR = best
    return best


def hbm_stream_measure(mb=4096, reps=5):
    """Measured HBM read rate: fold a big uint32 array into one vreg.
    Two-point slope (mb vs 2*mb arrays) cancels dispatch overhead."""
    TS = 512  # sublane rows per grid step

    def make(rows):
        def kernel(x_ref, o_ref):
            i = pl.program_id(0)
            acc = x_ref[0]
            for r in range(1, TS // 8):
                acc = acc ^ x_ref[r]

            @pl.when(i == 0)
            def _():
                o_ref[...] = jnp.zeros_like(acc)

            o_ref[...] = o_ref[...] ^ acc

        return jax.jit(pl.pallas_call(
            kernel,
            grid=(rows // (TS // 8),),
            in_specs=[pl.BlockSpec((TS // 8, 8, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.uint32),
        ))

    walls = []
    for m in (mb, 2 * mb):
        rows = m * (1 << 20) // (4 * 128 * 8)
        x = jnp.zeros((rows, 8, 128), jnp.uint32)
        fn = make(rows)
        int(np.asarray(fn(x)).sum())
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            int(np.asarray(fn(x)).sum())
            best = min(best, time.perf_counter() - t0)
        walls.append(best)
        del x
    byts = mb * (1 << 20)  # bytes in the slope region
    return byts / max(walls[1] - walls[0], 1e-9), walls


# ------------------------------------------------------- jaxpr counting
ARITH = {"add", "sub", "mul", "and", "or", "xor", "not", "neg", "max",
         "min", "rem", "div", "abs"}
SHIFT = {"shift_left", "shift_right_logical", "shift_right_arithmetic"}
POP = {"population_count", "clz"}
SELCMP = {"select_n", "eq", "ne", "lt", "le", "gt", "ge", "sign"}
MEM = {"get", "swap", "masked_load", "masked_swap", "load", "store"}
SKIP = {"broadcast_in_dim", "convert_element_type", "reshape", "iota",
        "squeeze", "bitcast_convert_type", "transpose", "slice",
        "dynamic_slice", "dynamic_update_slice", "concatenate", "pad"}


def _vregs(eqn):
    # charge by the OUTPUT value's size (a ref get/swap lists the whole
    # scratch ref among invars — the moved data is the outvar); fall
    # back to inputs for output-free eqns (stores)
    def biggest(vs):
        e = 0
        for v in vs:
            aval = getattr(v, "aval", None)
            if aval is not None and getattr(aval, "shape", ()):
                e = max(e, math.prod(aval.shape))
        return e

    elems = biggest(eqn.outvars)
    if elems == 0:
        # store-like: charge the smallest shaped operand (the value,
        # not the target ref)
        shaped = [
            math.prod(v.aval.shape) for v in eqn.invars
            if getattr(getattr(v, "aval", None), "shape", ())
        ]
        elems = min(shaped) if shaped else 0
    return max(1, elems // (8 * 128)) if elems >= 128 else 0


def count_jaxpr(jaxpr, loop_iters, counts=None, mult=1.0):
    """Walk a (kernel) jaxpr; loop_iters maps while-nesting depth ->
    average trip count (data-dependent loops get the measured mean)."""
    if counts is None:
        counts = {"arith": 0.0, "shift": 0.0, "popcount": 0.0,
                  "selcmp": 0.0, "mem": 0.0, "other": 0.0}
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "while":
            it = loop_iters.pop(0) if loop_iters else 1.0
            count_jaxpr(eqn.params["body_jaxpr"].jaxpr, loop_iters,
                        counts, mult * it)
            continue
        if name == "cond":
            for br in eqn.params["branches"]:
                count_jaxpr(br.jaxpr, loop_iters, counts, mult)
            continue
        if name in ("scan",):
            count_jaxpr(eqn.params["jaxpr"].jaxpr, loop_iters, counts,
                        mult * eqn.params.get("length", 1))
            continue
        if name in ("pjit", "jit", "closed_call", "custom_jvp_call",
                    "custom_vjp_call", "remat"):
            inner = eqn.params.get("jaxpr")
            if inner is not None:
                count_jaxpr(getattr(inner, "jaxpr", inner), loop_iters,
                            counts, mult)
            continue
        v = _vregs(eqn)
        if v == 0 or name in SKIP:
            continue
        if name in ARITH:
            counts["arith"] += mult * v
        elif name in SHIFT:
            counts["shift"] += mult * v
        elif name in POP:
            counts["popcount"] += mult * v
        elif name in SELCMP:
            counts["selcmp"] += mult * v
        elif name in MEM:
            counts["mem"] += mult * v
        else:
            counts["other"] += mult * v
    return counts


def find_pallas_jaxprs(jaxpr, out=None):
    if out is None:
        out = []
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "pallas_call":
            out.append(eqn.params["jaxpr"])
        for p in eqn.params.values():
            j = getattr(p, "jaxpr", None)
            if j is not None:
                find_pallas_jaxprs(j, out)
            if isinstance(p, (list, tuple)):
                for q in p:
                    jq = getattr(q, "jaxpr", None)
                    if jq is not None:
                        find_pallas_jaxprs(jq, out)
    return out


def greedy_counts(avg_steps: float, tile: int):
    from asm_tpu.config import AlignConfig
    from asm_tpu.kernels.greedy_pallas import greedy_align_pallas

    cfg = AlignConfig(x=1, o=1, e=1, k=3, max_len=128, max_steps=32)
    W2 = 128 // 16
    B = tile
    rc = jnp.zeros((B // tile, W2, tile), jnp.uint32)
    rl = jnp.zeros((B,), jnp.int32)
    jx = jax.make_jaxpr(functools.partial(
        greedy_align_pallas, cfg=cfg, pre_staged="planes_tiled",
        interpret=False))(rc, rl, rc, rl)
    kj = find_pallas_jaxprs(jx.jaxpr)
    assert kj, "no pallas_call found"
    # loop order in the kernel: the main step while-loop (avg_steps - 1
    # iterations: iteration 0 is peeled)
    kj0 = getattr(kj[0], 'jaxpr', kj[0])
    return count_jaxpr(kj0, [max(avg_steps - 1, 0)])


def leap_counts(avg_energy: float, tile: int):
    from asm_tpu.config import AlignConfig
    from asm_tpu.kernels.leap_pallas import leap_align_pallas

    cfg = AlignConfig(x=1, o=1, e=1, k=3, max_len=128)
    W2 = 128 // 16
    B = tile
    rc = jnp.zeros((B // tile, W2, tile), jnp.uint32)
    rl = jnp.zeros((B,), jnp.int32)
    jx = jax.make_jaxpr(functools.partial(
        leap_align_pallas, cfg=cfg, pre_staged="planes_tiled",
        interpret=False))(rc, rl, rc, rl)
    kj = find_pallas_jaxprs(jx.jaxpr)
    kj0 = getattr(kj[0], 'jaxpr', kj[0])
    # the round-5 steady loop runs TWO energy levels per iteration (the
    # second inside a pl.when/cond region, which count_jaxpr charges at
    # full mult), so the body already carries both levels' ops: trips =
    # avg energy / 2
    return count_jaxpr(kj0, [avg_energy / 2])


def report(name, counts, tile, pairs_per_sec, in_bytes_per_pair,
           out_bytes_per_pair, vpu, hbm):
    total = sum(counts.values())
    per_pair = {k: v * (8 * 128) / tile for k, v in counts.items()}
    lanes_pp = total * (8 * 128) / tile
    t_meas = 1.0 / pairs_per_sec
    # vreg-ops per pair / vreg-ops per second
    t_vpu = (total / tile) / vpu
    t_hbm = (in_bytes_per_pair + out_bytes_per_pair) / hbm
    bound = "VPU" if t_vpu > t_hbm else "HBM"
    print(json.dumps({
        "kernel": name,
        "vreg_ops_per_pair": round(total / tile, 2),
        "lane_ops_per_pair": round(lanes_pp, 1),
        "by_category_per_pair": {k: round(v, 1)
                                 for k, v in per_pair.items()},
        "bytes_per_pair": in_bytes_per_pair + out_bytes_per_pair,
        "measured_ns_per_pair": round(t_meas * 1e9, 3),
        "vpu_bound_ns_per_pair": round(t_vpu * 1e9, 3),
        "hbm_bound_ns_per_pair": round(t_hbm * 1e9, 3),
        "binding_wall": bound,
        "headroom_x": round(t_meas / max(t_vpu, t_hbm), 2),
    }))


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))
    which = sys.argv[1:] or ["micro", "greedy", "leap"]
    tile = int(os.environ.get("ASM_GREEDY_TILE", 4096))

    vpu = hbm = None
    if "micro" in which:
        floor = dispatch_floor()
        print(f"dispatch floor: {floor*1e3:.1f} ms", file=sys.stderr)
        vpu, walls, _ = vpu_peak_measure()
        print(f"VPU int32 issue rate: {vpu/1e9:.2f} G vreg-ops/s "
              f"({vpu*1024/1e12:.2f} T lane-ops/s; walls "
              f"{[round(w*1e3,1) for w in walls]} ms)", file=sys.stderr)
        hbm, walls = hbm_stream_measure()
        print(f"HBM stream rate: {hbm/1e9:.0f} GB/s (walls "
              f"{[round(w*1e3,1) for w in walls]} ms)", file=sys.stderr)
        print(json.dumps({"vpu_vreg_ops_per_sec": round(vpu, 1),
                          "hbm_bytes_per_sec": round(hbm, 1)}))
    if vpu is None:
        vpu = float(os.environ.get("RL_VPU", 2.5e9))
        hbm = float(os.environ.get("RL_HBM", 700e9))

    if "greedy" in which:
        # measured production numbers: 715.8M aligns/s net of the
        # tunnel (87 ms kernel at 67.1M pairs), avg steps ~4.3 on the
        # difficulty-sorted corpus (chunk bounds [3, 29], mean from the
        # steps output), int16 records bound 29 on the hot chunk
        aps = float(os.environ.get("RL_GREEDY_APS", 67108864 / 0.087))
        steps = float(os.environ.get("RL_GREEDY_STEPS", 4.3))
        c = greedy_counts(steps, tile)
        report("greedy", c, tile, aps, 64 + 8,
               8 + 2 * 31, vpu, hbm)
    if "leap" in which:
        aps = float(os.environ.get("RL_LEAP_APS", 67108864 / 0.110))
        energy = float(os.environ.get("RL_LEAP_ENERGY", 5.0))
        c = leap_counts(energy, tile)
        report("leap", c, tile, aps, 64 + 8, 12, vpu, hbm)


if __name__ == "__main__":
    main()
