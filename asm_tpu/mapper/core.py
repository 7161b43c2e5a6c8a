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
from asm_tpu.native import FMIndex, load_native
from asm_tpu.ops.cigar import batch_greedy_cigars


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

    # gather candidate (read, window) pairs — one native call per batch
    starts, counts = _candidates_batch(idx, read_codes, read_lens, mcfg)
    jobs = [
        (ri, int(starts[ri, t]))
        for ri in range(n_reads)
        for t in range(int(counts[ri]))
    ]

    best = [None] * n_reads
    if jobs:
        # batched rescoring (window = read_len + 1, main.cpp:79-80);
        # every launch is padded to the SAME [mcfg.batch, L] shape so the
        # kernel compiles exactly once (a TPU compile costs far more than
        # the padded rows)
        for base in range(0, len(jobs), mcfg.batch):
            batch = jobs[base: base + mcfg.batch]
            bs = len(batch)
            padded = mcfg.batch
            q = np.zeros((padded, L), np.int8)
            ql = np.zeros(padded, np.int32)
            w = np.full((padded, L), PAD_REF, np.int8)
            wl = np.zeros(padded, np.int32)
            for bi, (ri, start) in enumerate(batch):
                q[bi] = read_codes[ri]
                ql[bi] = read_lens[ri]
                span = min(int(read_lens[ri]) + 1, ref_len_total - start, L)
                w[bi, :span] = ref_codes[start: start + span]
                w[bi, span:] = PAD_REF
                wl[bi] = span
            out = align_fn(
                jnp.asarray(q), jnp.asarray(ql), jnp.asarray(w),
                jnp.asarray(wl),
            )
            costs = np.asarray(out["cost"])
            cigars = batch_greedy_cigars(
                {k: np.asarray(v) for k, v in out.items()
                 if k.startswith("cigar")}
            )
            for bi, (ri, start) in enumerate(batch):
                c = int(costs[bi])
                if best[ri] is None or c < best[ri]["cost"]:
                    best[ri] = dict(
                        read=ri,
                        pos=start,
                        cost=c,
                        cigar=cigars[bi],
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
