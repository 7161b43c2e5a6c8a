"""Validate the scalar emulators against the COMPILED reference kernels.

Builds a tiny conformance driver (build_ref/ref_driver, gitignored) that
compiles the reference's own hurdle_matrix.h and LV_BAG.cpp read-only from
/root/reference, runs both on generated corpora, and diffs against
asm_tpu.reference_impl.{greedy_ref,leap_ref}. Requires an x86-64 host with
g++ (the reference is SSE4.2/AVX2 code); run on demand, not in CI.

Known, documented divergence (asm_tpu.reference_impl docstrings): the
reference compares STALE BUFFER BYTES past a string's true end (reused
fixed buffers, hurdle_matrix.h:497 strncpy) — its output for a pair can
change with the preceding pair (verified: see pair-order experiment in the
repo history). The emulators use deterministic mismatch sentinels instead,
so small cost diffs (<~1% at err<=0.2, ~7% at the pathological
err=0.4/indel-heavy corpus) and tie-level CIGAR flips are expected at high
error rates; at the headline rates (0.05/0.10) cost agreement is 100%.

Usage: python tools/validate_vs_reference.py
"""

from __future__ import annotations

import os
import subprocess
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REF = "/root/reference"
BUILD = os.path.join(REPO, "build_ref")

DRIVER_SRC = r"""
// Conformance driver: runs the REFERENCE hurdle_matrix + LV kernels
// (included read-only from /root/reference) on stdin pairs, printing
// "greedy_cost greedy_cigar leap_pass leap_ed" per pair.
#include <cstdio>
#include <iostream>
#include <string>
#include "hurdle_matrix.h"
#include "benchmark/LEAP_SIMD/LV_BAG.h"

int main(int argc, char** argv) {
    int k = argc > 1 ? atoi(argv[1]) : 3;
    int x = argc > 2 ? atoi(argv[2]) : 1;
    int o = argc > 3 ? atoi(argv[3]) : 1;
    int e = argc > 4 ? atoi(argv[4]) : 1;
    int af = argc > 5 ? atoi(argv[5]) : 200;
    std::string a, b;
    auto* matrix = new hurdle_matrix<int_128bit>(GLOBAL, x, o, e);
    auto* lv = new LV();
    lv->init(k, af, ED_GLOBAL, x, o, e);
    while (std::getline(std::cin, a) && std::getline(std::cin, b)) {
        matrix->reset((char*)a.c_str(), (int)a.length(),
                      (char*)b.c_str(), (int)b.length(), k);
        matrix->run();
        int cost = matrix->get_cost();
        std::string cig = matrix->get_CIGAR();
        int buflen = std::max(a.length(), b.length());
        lv->load_reads((char*)a.c_str(), (char*)b.c_str(), buflen);
        lv->reset();
        lv->run();
        printf("%d %s %d %d\n", cost, cig.empty() ? "-" : cig.c_str(),
               lv->check_pass() ? 1 : 0, lv->get_ED());
    }
    return 0;
}
"""

# the reference includes boost/preprocessor only for BOOST_PP_DIV on
# integer constants — shim it rather than requiring boost
SHIM = "#pragma once\n#ifndef BOOST_PP_DIV\n#define BOOST_PP_DIV(a, b) ((a) / (b))\n#endif\n"


def build_driver() -> str:
    driver = os.path.join(BUILD, "ref_driver")
    if os.path.exists(driver):
        return driver
    os.makedirs(os.path.join(BUILD, "shim/boost/preprocessor/punctuation"),
                exist_ok=True)
    for f in ("repetition.hpp", "iteration.hpp", "arithmetic.hpp"):
        with open(os.path.join(BUILD, "shim/boost/preprocessor", f), "w") as fh:
            fh.write(SHIM)
    with open(os.path.join(
            BUILD, "shim/boost/preprocessor/punctuation/comma_if.hpp"),
            "w") as fh:
        fh.write("#pragma once\n")
    src = os.path.join(BUILD, "ref_driver.cpp")
    with open(src, "w") as fh:
        fh.write(DRIVER_SRC)
    subprocess.run(
        ["g++", "-O2", "-msse4.2", "-mbmi", "-mavx2",
         "-I", os.path.join(BUILD, "shim"),
         "-I", os.path.join(REF, "GASMA"),
         "-I", os.path.join(REF, "GASMA/benchmark/LEAP_SIMD"),
         src,
         os.path.join(REF, "GASMA/bit_convert.cpp"),
         os.path.join(REF, "GASMA/mask.cpp"),
         os.path.join(REF, "GASMA/benchmark/LEAP_SIMD/LV_BAG.cpp"),
         "-o", driver],
        check=True,
    )
    return driver


def main():
    from asm_tpu.data.generator import generate_dataset
    from asm_tpu.reference_impl.greedy_ref import greedy_ref
    from asm_tpu.reference_impl.leap_ref import leap_ref

    driver = build_driver()
    ok = True
    for err, mr, seed, n in [(0.05, 0.96, 1, 200), (0.10, 0.96, 2, 200),
                             (0.15, 0.96, 4, 200), (0.20, 0.96, 3, 200),
                             (0.40, 0.50, 7, 100)]:
        reads, refs = generate_dataset(n, 100, err, mr, seed=seed)
        inp = "".join(f"{a}\n{b}\n" for a, b in zip(reads, refs))
        out = subprocess.run([driver, "3", "1", "1", "1", "200"],
                             input=inp, capture_output=True,
                             text=True).stdout.strip().split("\n")
        gc = gg = lb = 0
        for i, line in enumerate(out):
            parts = line.split()
            rcost, rcig = int(parts[0]), parts[1]
            rpass, red = int(parts[2]), int(parts[3])
            ec, ecig = greedy_ref(reads[i], refs[i], k=3)
            lp, led, _ = leap_ref(reads[i], refs[i], k=3, af_threshold=200)
            gc += ec != rcost
            gg += ecig != (rcig if rcig != "-" else "")
            lb += (int(lp), led) != (rpass, red)
        print(f"err={err} mr={mr}: greedy cost mism {gc}/{n}, "
              f"cigar mism {gg}/{n}, leap mism {lb}/{n}")
        # headline rates must agree on cost ~perfectly; LEAP always
        if err <= 0.10 and gc > n * 0.01:
            ok = False
        if lb > 0:
            ok = False
    print("VALIDATION", "OK" if ok else "FAILED")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
