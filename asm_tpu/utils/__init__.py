"""Utilities: profiling/counters, structured logging, corpus caching."""

from asm_tpu.utils.profiling import (
    Timer,
    KernelStats,
    trace_to,
    force_completion,
)
from asm_tpu.utils.corpus_cache import save_corpus, load_corpus

__all__ = [
    "Timer",
    "KernelStats",
    "trace_to",
    "force_completion",
    "save_corpus",
    "load_corpus",
]
