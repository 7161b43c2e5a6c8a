"""Mapper core: FM-index candidates -> batched TPU rescoring -> SAM.

Candidate generation replaces SeqAn3's approximate `search(query, index,
max_error_total)` (mapper/main.cpp:67-77) with pigeonhole seeding: a read
with <= e errors split into e+1 seeds has at least one error-free seed, so
exact backward search of each seed finds every true location (plus decoys,
which batched rescoring eliminates — mirroring the reference's
hurdle_matrix rescoring of every hit, main.cpp:82-86).

Reference parity quirks kept deliberately:
  * window = ref[start .. start + |q| + 1] (main.cpp:79-80 span);
  * MAPQ = 60 + greedy cost (main.cpp:96 — the reference literally adds
    the penalty to 60);
  * hit_single_best: one best-cost record per read.
Improvement over the reference: the SAM CIGAR is the greedy kernel's real
CIGAR (the reference emits a FIXME'd dummy alignment, main.cpp:91).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from asm_tpu.config import AlignConfig
from asm_tpu.encoding import PAD_REF
from asm_tpu.kernels.greedy import greedy_align
from asm_tpu.native import FMIndex


@dataclasses.dataclass(frozen=True)
class MapperConfig:
    max_errors: int = 3          # pigeonhole seeds = max_errors + 1
    max_hits_per_seed: int = 16  # locate cap per seed range
    max_candidates: int = 64     # per read, after dedupe
    max_len: int = 128
    align: AlignConfig = AlignConfig(x=1, o=1, e=1, k=3)
    batch: int = 4096            # rescoring launch size


def build_index(ref_codes: np.ndarray, out_path: str | None = None) -> FMIndex:
    """Build (and optionally serialize) the FM-index over a reference
    (my-indexer, indexer.cpp:23-93)."""
    idx = FMIndex.build(np.ascontiguousarray(ref_codes, np.int8))
    if out_path:
        idx.save(out_path)
    return idx


def _candidates_batch(idx, read_codes, read_lens, mcfg: MapperConfig):
    """Pigeonhole candidate starts for the whole batch: ONE native call
    (asm_fm_candidates) instead of per-seed ctypes round-trips; seeds
    whose SA range exceeds max_hits_per_seed are evenly SAMPLED across
    the range — a true site in a repeat region stays reachable where a
    silent skip would lose it (cf. SeqAn3 enumerating every hit,
    mapper/main.cpp:67-77)."""
    return idx.candidates_batch(
        read_codes,
        read_lens,
        max_errors=mcfg.max_errors,
        max_hits_per_seed=mcfg.max_hits_per_seed,
        max_candidates=mcfg.max_candidates,
    )


def map_reads(
    idx: FMIndex,
    ref_codes: np.ndarray,
    read_codes: np.ndarray,
    read_lens: np.ndarray,
    read_names: list[str] | None = None,
    mcfg: MapperConfig | None = None,
    ref_name: str = "ref",
):
    """Map a read batch; returns a list of SAM record dicts (best hit per
    read; None entries for unmapped reads) and the SAM text."""
    mcfg = mcfg or MapperConfig()
    n_reads, L = read_codes.shape
    ref_len_total = ref_codes.shape[0]
    align_fn = jax.jit(functools.partial(greedy_align, cfg=mcfg.align))
    # phase-1 scoring pulls ONLY the cost vector; returning just "cost"
    # lets XLA dead-code-eliminate the CIGAR buffer upkeep entirely and
    # keeps per-batch device->host traffic at 4 B/candidate
    cost_fn = jax.jit(
        lambda a, b, c, d: greedy_align(a, b, c, d, mcfg.align)["cost"]
    )

    # gather candidate (read, window) pairs — one native call per batch;
    # the job list, window assembly and best-hit selection are all
    # vectorized numpy (a per-candidate Python loop dominated wall time
    # at scale long before the TPU did)
    starts, counts = _candidates_batch(idx, read_codes, read_lens, mcfg)
    mask = np.arange(starts.shape[1])[None, :] < counts[:, None]
    jobs_ri, jobs_t = np.nonzero(mask)
    jobs_start = starts[jobs_ri, jobs_t].astype(np.int64)
    nj = jobs_ri.size

    colv = np.arange(L, dtype=np.int64)
    rlens = read_lens.astype(np.int64)

    def assemble(bri, bst):
        """Padded [batch, L] (q, ql, w, wl) arrays for a job slice
        (window = read_len + 1, main.cpp:79-80); every launch has the
        SAME shape so each kernel compiles exactly once."""
        bs = bri.size
        padded = mcfg.batch
        q = np.zeros((padded, L), np.int8)
        ql = np.zeros(padded, np.int32)
        w = np.full((padded, L), PAD_REF, np.int8)
        wl = np.zeros(padded, np.int32)
        q[:bs] = read_codes[bri]
        ql[:bs] = read_lens[bri]
        span = np.minimum(np.minimum(rlens[bri] + 1,
                                     ref_len_total - bst), L)
        win = ref_codes[np.minimum(bst[:, None] + colv[None, :],
                                   ref_len_total - 1)]
        w[:bs] = np.where(colv[None, :] < span[:, None], win, PAD_REF)
        wl[:bs] = span
        return (jnp.asarray(q), jnp.asarray(ql), jnp.asarray(w),
                jnp.asarray(wl))

    from asm_tpu.ops.cigar import runs_to_cigar

    # strategy: with a high candidate fan-out (repeat-heavy genomes,
    # large max_candidates) a cost-only scoring pass plus a winners-only
    # CIGAR pass avoids pulling/decoding per-candidate records; with
    # ~1 candidate/read the second pass would nearly double the align
    # work, so pull records in the single pass instead (measured
    # crossover ~2 candidates/read)
    two_phase = nj > 2 * n_reads

    big = np.iinfo(np.int64).max
    best_cost = np.full(n_reads, big, np.int64)
    best_pos = np.zeros(n_reads, np.int64)
    best_rec = [None] * n_reads
    if nj:
        # phase 1 — dispatch EVERY scoring batch before pulling any
        # result: the device queue pipelines the kernels against the
        # host-side window assembly, and per-dispatch latency (25-30 ms
        # through the axon tunnel) is paid once instead of per batch
        phase1 = cost_fn if two_phase else align_fn
        pending = []
        for base in range(0, nj, mcfg.batch):
            sel = slice(base, min(base + mcfg.batch, nj))
            bri = jobs_ri[sel]
            bst = jobs_start[sel]
            pending.append((bri, bst, phase1(*assemble(bri, bst))))
        for bri, bst, out in pending:
            bs = bri.size
            cv = out if two_phase else out["cost"]
            costs = np.asarray(cv)[:bs].astype(np.int64)
            # per-read minimum with the original first-candidate-wins
            # tie break: stable (read, cost, order) sort, keep each
            # read's first row, then strict `<` against earlier batches
            order = np.lexsort((np.arange(bs), costs, bri))
            keep = np.ones(order.size, bool)
            sri = bri[order]
            keep[1:] = sri[1:] != sri[:-1]
            rows = order[keep]
            rows = rows[costs[rows] < best_cost[bri[rows]]]
            best_cost[bri[rows]] = costs[rows]
            best_pos[bri[rows]] = bst[rows]
            if not two_phase and rows.size:
                ops = np.asarray(out["cigar_ops"])
                runs = np.asarray(out["cigar_runs"])
                for row in rows:
                    best_rec[int(bri[row])] = (ops[row].copy(),
                                               runs[row].copy())

    mapped = np.nonzero(best_cost < big)[0]
    best = [None] * n_reads
    if two_phase:
        # phase 2 — CIGARs for the winning placements only (one aligned
        # batch per n_reads/batch instead of per candidate)
        pending = []
        for base in range(0, mapped.size, mcfg.batch):
            bri = mapped[base: base + mcfg.batch]
            pending.append((bri, align_fn(*assemble(bri, best_pos[bri]))))
        for bri, out in pending:
            ops = np.asarray(out["cigar_ops"])
            runs = np.asarray(out["cigar_runs"])
            for bi, ri in enumerate(bri):
                best_rec[int(ri)] = (ops[bi], runs[bi])
    for ri in mapped:
        c = int(best_cost[ri])
        best[ri] = dict(
            read=int(ri),
            pos=int(best_pos[ri]),
            cost=c,
            cigar=runs_to_cigar(*best_rec[ri]),
            mapq=60 + c,  # reference quirk, main.cpp:96
        )

    names = read_names or [f"read{i}" for i in range(n_reads)]
    lines = [
        "@HD\tVN:1.6\tSO:unknown",
        f"@SQ\tSN:{ref_name}\tLN:{ref_len_total}",
        "@PG\tID:asm_tpu\tPN:asm_tpu-mapper",
    ]
    from asm_tpu.encoding import decode_string

    for ri in range(n_reads):
        seq = decode_string(read_codes[ri], int(read_lens[ri]))
        b = best[ri]
        if b is None:
            lines.append(
                f"{names[ri]}\t4\t*\t0\t0\t*\t*\t0\t0\t{seq}\t*"
            )
        else:
            lines.append(
                f"{names[ri]}\t0\t{ref_name}\t{b['pos'] + 1}\t{b['mapq']}\t"
                f"{b['cigar'] or '*'}\t*\t0\t0\t{seq}\t*"
            )
    return best, "\n".join(lines) + "\n"
