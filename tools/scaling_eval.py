"""Scaling-efficiency artifact (VERDICT r4 item #4) — PROXY measurement.

Real multi-chip hardware is not available in this environment (one TPU
chip through a tunnel), so this tool measures what CAN be isolated on
CPU devices: the SERIALIZATION / distributed-runtime overhead of the
multi-host pipeline, not interconnect bandwidth.

Two comparisons, both over `make_sharded_pipeline` (psum-reduced stats,
the SURVEY §2.3 multi-host surface), through real `jax.distributed`
processes:

  * STRONG proxy (headline): fixed total work and fixed physical cores —
    1 process x 8 virtual devices vs 2 processes x 4 devices, same
    global corpus. Any wall-clock delta is coordination + cross-process
    collective serialization (the compute and the cores are identical).
    Ideal efficiency = 1.0.
  * WEAK rows (context): fixed per-process corpus, 1 -> 2 processes.
    On this 4-core host the two processes SHARE the cores, so the ideal
    weak efficiency here is ~0.5 (a core-count artifact, labeled as
    such); the row exists to show the pipeline serializes no worse than
    the core budget predicts.

Also extends the multichip dryrun to 16- and 32-virtual-device meshes
(mesh-size robustness of the sharded compile path).

Usage: python tools/scaling_eval.py [--pairs-per-proc 8192] [--reps 5]
Writes RESULTS_scaling_v5e.txt.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_cluster(num_procs, devices_per_proc, pairs_global, reps, tag):
    """Spawn a jax.distributed cluster of demo workers; return the
    per-rep walls of process 0 (stats are replicated, walls near-equal)."""
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devices_per_proc}")
    env["PYTHONPATH"] = (
        REPO + os.pathsep + env["PYTHONPATH"]
        if env.get("PYTHONPATH") else REPO
    )
    procs, outs = [], []
    for pid in range(num_procs):
        out = f"/tmp/scaling_{tag}_{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "asm_tpu.parallel.multihost_demo",
             "--process-id", str(pid), "--num-processes", str(num_procs),
             "--port", str(port), "--out", out,
             "--pairs", str(pairs_global), "--reps", str(reps)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        ))
    for p in procs:
        log, _ = p.communicate(timeout=900)
        assert p.returncode == 0, log.decode(errors="replace")[-3000:]
    results = [json.load(open(o)) for o in outs]
    assert all(r["stats"] == results[0]["stats"] for r in results)
    return results[0]


def _dryrun(n_devices):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_devices}")
    env["PYTHONPATH"] = (
        REPO + os.pathsep + env["PYTHONPATH"]
        if env.get("PYTHONPATH") else REPO
    )
    code = (f"import __graft_entry__ as g; "
            f"g.dryrun_multichip({n_devices}); print('DRYRUN_OK')")
    p = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                       capture_output=True, text=True, timeout=1800)
    ok = p.returncode == 0 and "DRYRUN_OK" in p.stdout
    assert ok, (p.stdout + p.stderr)[-3000:]
    return ok


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs-per-proc", type=int, default=8192)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--out", default=os.path.join(
        REPO, "RESULTS_scaling_v5e.txt"))
    args = ap.parse_args(argv)

    ppp = args.pairs_per_proc
    med = lambda r: statistics.median(r["rep_seconds"])  # noqa: E731

    print("strong proxy: 1x8 vs 2x4, same global corpus ...",
          file=sys.stderr)
    s1 = _run_cluster(1, 8, 2 * ppp, args.reps, "s1x8")
    s2 = _run_cluster(2, 4, 2 * ppp, args.reps, "s2x4")
    strong_eff = med(s1) / med(s2)

    print("weak rows: fixed per-process corpus, 1 -> 2 procs ...",
          file=sys.stderr)
    w1 = _run_cluster(1, 4, ppp, args.reps, "w1x4")
    w2 = _run_cluster(2, 4, 2 * ppp, args.reps, "w2x4")
    weak_eff = med(w1) / med(w2)

    print("dryrun robustness at 16/32 virtual devices ...", file=sys.stderr)
    dry16 = _dryrun(16)
    dry32 = _dryrun(32)

    lines = f"""# Scaling-efficiency artifact — PROXY, CPU devices (VERDICT r4 #4).
# python tools/scaling_eval.py --pairs-per-proc {ppp} --reps {args.reps}
# This is a SERIALIZATION check of the jax.distributed pipeline, NOT an
# interconnect-bandwidth claim: no multi-chip hardware exists in this
# environment (BASELINE.md:45-47's N-host target is validated here only
# up to what CPU processes can prove; the sharding/psum code is the
# same code that would ride ICI on a pod).
#
# STRONG proxy (fixed total work {2*ppp} pairs, fixed 4 physical cores):
#   1 process x 8 virtual devices : median rep {med(s1):.3f} s
#   2 processes x 4 devices each  : median rep {med(s2):.3f} s
#   efficiency t(1proc)/t(2proc)  : {strong_eff:.3f}   (ideal 1.0 —
#   the delta is cross-process coordination + collective serialization)
#
# WEAK rows (fixed per-process corpus {ppp} pairs; the two processes
# SHARE this host's 4 cores, so the core-budget ideal is ~0.5):
#   1 process x 4 devices, {ppp} pairs   : median rep {med(w1):.3f} s
#   2 processes x 4 devices, {2*ppp} pairs: median rep {med(w2):.3f} s
#   t(1)/t(2) = {weak_eff:.3f}
#
# psum'd stats replicated and equal across processes in every cluster
# (asserted); per-pair equality vs the single-process mesh is pinned by
# tests/test_multihost.py.
#
# dryrun_multichip mesh-size robustness: 16 devices {"OK" if dry16 else "FAIL"}, 32 devices {"OK" if dry32 else "FAIL"}
# (full tp/pp-style sharded compile incl. both Pallas kernels under
# shard_map; __graft_entry__.dryrun_multichip).
"""
    with open(args.out, "w") as f:
        f.write(lines)
    print(lines)


if __name__ == "__main__":
    main()
