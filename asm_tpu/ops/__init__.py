from asm_tpu.ops.bitops import (
    shift_toward_0,
    shift_away_0,
    flip_short_hurdles,
    flip_short_matches,
    next_one_index,
    next_zero_index,
    prefix_count,
    count_between,
)
from asm_tpu.ops.hurdles import (
    build_greedy_lanes,
    build_leap_lanes,
    lane_destination,
    switch_lane_penalty,
    switch_forward_column,
)

__all__ = [
    "shift_toward_0",
    "shift_away_0",
    "flip_short_hurdles",
    "flip_short_matches",
    "next_one_index",
    "next_zero_index",
    "prefix_count",
    "count_between",
    "build_greedy_lanes",
    "build_leap_lanes",
    "lane_destination",
    "switch_lane_penalty",
    "switch_forward_column",
]
