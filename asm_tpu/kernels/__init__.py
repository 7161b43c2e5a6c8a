from asm_tpu.kernels.nw import nw_align, nw_penalty
from asm_tpu.kernels.greedy import greedy_align
from asm_tpu.kernels.leap import leap_align
from asm_tpu.kernels.shd import shd_filter

__all__ = ["nw_align", "nw_penalty", "greedy_align", "leap_align", "shd_filter"]
