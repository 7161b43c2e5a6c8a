from asm_tpu.metrics.coverage import (
    long_consecutive_matching_substring,
    covers,
    check_coverage,
)
from asm_tpu.metrics.numleaps import num_leaps

__all__ = [
    "long_consecutive_matching_substring",
    "covers",
    "check_coverage",
    "num_leaps",
]
