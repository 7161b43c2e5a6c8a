"""Hermetic tests of the three-way benchmark harness (asm_tpu.bench).

Runs both impls on the CPU rig (pallas in interpret mode) and checks the
accuracy/coverage numbers agree — the harness is the reference-report
surface (benchmark_utils.h:390-402), so its numbers must not depend on
which kernel implementation produced them.
"""

import numpy as np

from asm_tpu.bench.harness import run_benchmark, format_report
from asm_tpu.config import AlignConfig
from asm_tpu.data.generator import generate_dataset_arrays


def test_harness_pallas_matches_xla_accuracies():
    corpus = generate_dataset_arrays(256, 100, 0.10, 0.96, seed=4)
    cfg = AlignConfig()
    rx = run_benchmark(*corpus, cfg=cfg, chunk=256, coverage_sample=64,
                       impl="xla")
    rp = run_benchmark(*corpus, cfg=cfg, chunk=256, coverage_sample=64,
                       impl="pallas", interpret=True)
    assert rx.total == rp.total == 256
    assert rx.nw_accuracy == rp.nw_accuracy == 1.0
    assert rx.greedy_accuracy == rp.greedy_accuracy
    assert rx.leap_accuracy == rp.leap_accuracy
    assert rx.greedy_coverage == rp.greedy_coverage
    # sanity: the expected ballparks at err=0.10 (SURVEY/BASELINE)
    assert 0.70 < rx.greedy_accuracy < 0.90
    assert rx.leap_accuracy > 0.93
    report = format_report(rp)
    assert "Benchmark Results" in report and "Coverage" in report
