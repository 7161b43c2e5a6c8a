"""Test config: force a CPU backend with 8 virtual devices so kernels and
multi-chip sharding are exercised without TPU hardware (the driver's bench
runs on the real chip; tests must be hermetic and fast)."""

import os

# NOTE: the environment's sitecustomize (PYTHONPATH=/root/.axon_site)
# IMPORTS jax and pins JAX_PLATFORMS=axon before any test code runs, so
# the env var is already consumed — only jax.config.update can still
# select the CPU backend (the backend itself initializes lazily).
# XLA_FLAGS, by contrast, is read at backend init, so the env var works.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

if os.environ.get("ASM_TPU_TEST_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

# Persistent compile cache for the suite: a full run JIT-compiles ~200+
# CPU programs in one process, which the XLA CPU backend handles flakily
# under load (observed rare segfaults inside backend_compile_and_load;
# clean reruns pass). Cached runs compile almost nothing — faster AND
# far fewer in-process JIT events. Gitignored dir, shared with bench.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np
import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """A full suite run JIT-compiles 400+ XLA:CPU programs in ONE
    process; past ~that many live executables the LLVM JIT segfaults
    nondeterministically inside backend_compile_and_load (observed at
    ~64% of the suite; the same tests pass in half-suite runs).
    Dropping executable references between modules keeps the live set
    small; the persistent compile cache above makes the re-loads
    cheap."""
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


def random_pair(rng, length=100, error_rate=0.1, mismatch_rate=0.96):
    """One WFA-style read/ref pair (same process as the corpus generator)."""
    from asm_tpu.data.generator import generate_dataset

    seed = int(rng.integers(0, 2**31))
    reads, refs = generate_dataset(
        1, length, error_rate, mismatch_rate, exact_error_rate=True, seed=seed
    )
    return reads[0], refs[0]
