"""Stage the bench's compiled-program cache entries for committing.

The driver runs `python bench.py` in a wiped tree (gitignored caches
gone) and pays 150-200 s of remote TPU compile per program. Cache
entries are ~230 KB each, so the fix is to COMMIT them: run the bench
locally with the final kernel code, then

    python tools/seed_jax_cache.py

copies every bench step program (jit_step-*) from .jax_cache/ into
jax_cache_seed/ (tracked by git). bench.py copies the seed back into
.jax_cache/ at startup, so a cold driver run compiles nothing.
"""

import os
import shutil
import sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
src = os.path.join(repo, ".jax_cache")
dst = os.path.join(repo, "jax_cache_seed")
os.makedirs(dst, exist_ok=True)
pats = sys.argv[1:] or ["jit_step-"]
n = 0
for f in sorted(os.listdir(src)):
    if any(f.startswith(p) for p in pats):
        shutil.copy(os.path.join(src, f), os.path.join(dst, f))
        print(f"seeded {f} ({os.path.getsize(os.path.join(src, f))} B)")
        n += 1
print(f"{n} entries -> {dst}")
