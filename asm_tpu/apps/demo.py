"""Demo main — mirror of GASMA/main.cpp:5-19.

Runs the greedy hurdle-matrix aligner on one pair (the reference's
hardcoded strings by default, or two CLI args), printing the hurdle
matrix, CIGAR, cost, and the LCM coverage string.

  python -m asm_tpu.apps.demo [READ REF]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

# the pair hardcoded in GASMA/main.cpp:8-9
DEFAULT_READ = "TTTTAAAACCCCGGGGTTTTAAAACCCCGGGG"
DEFAULT_REF = "TTTTAAACCCCGGGGTTTTAAAAACCCCGGGG"


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    read, ref = (argv[0], argv[1]) if len(argv) >= 2 else (
        DEFAULT_READ, DEFAULT_REF
    )
    from asm_tpu import AlignConfig, encode_batch, greedy_align
    from asm_tpu.ops.bitops import flip_short_hurdles
    from asm_tpu.ops.cigar import batch_greedy_cigars
    from asm_tpu.ops.hurdles import build_greedy_lanes
    from asm_tpu.metrics.coverage import long_consecutive_matching_substring

    cfg = AlignConfig(x=1, o=1, e=1, k=3)
    rc, rl, fc, fl = encode_batch([read], [ref], cfg.max_len)

    # print the hurdle matrix like hurdle_matrix::print (hurdle_matrix.h:602)
    lanes = np.asarray(
        flip_short_hurdles(
            build_greedy_lanes(jnp.asarray(rc), jnp.asarray(fc), cfg.k), 1
        )
    )[0]
    width = max(len(read), len(ref)) + cfg.k + 1
    for li in range(lanes.shape[0]):
        print(f"lane {li - cfg.k:+d}: "
              + "".join(str(int(b)) for b in lanes[li][:width]))

    out = greedy_align(
        jnp.asarray(rc), jnp.asarray(rl), jnp.asarray(fc), jnp.asarray(fl),
        cfg,
    )
    cigar = batch_greedy_cigars(out)[0]
    cost = int(np.asarray(out["cost"])[0])
    print(f"CIGAR: {cigar}")
    print(f"total cost: {cost}")
    # aligned string pair, like the reference's -DDISPLAY echo
    # (_update_match, hurdle_matrix.h:204-228 / main run print :591-594)
    from asm_tpu.ops.cigar import aligned_strings

    a_row, b_row = aligned_strings(read, ref, cigar)
    print(f"read: {a_row}")
    print(f"ref:  {b_row}")
    lcm = long_consecutive_matching_substring(read, ref, cigar, 3)
    print(f"LCM (threshold 3): {lcm}")


if __name__ == "__main__":
    main()
