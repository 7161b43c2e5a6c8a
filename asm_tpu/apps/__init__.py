"""Small CLI applications mirroring the reference's driver executables:

  python -m asm_tpu.apps.demo         — GASMA/main.cpp:5-19 (single pair)
  python -m asm_tpu.apps.leap_filter  — LEAP_SIMD/main.cpp:35-300 (stdin
                                        batch edit-distance filter)
"""
