"""Test harness config: force JAX onto CPU with 8 virtual devices.

This is the standard JAX substitute for multi-chip hardware in CI — sharding
tests exercise real pjit/collective lowering on a virtual mesh (SURVEY.md §4).
Must run before jax initializes a backend, hence env mutation at import time.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_backend_optimization_level" not in flags:
    # The suite is XLA:CPU-compile-bound on this 1-core host; LLVM -O0
    # cuts compile wall ~35% (test_video 77.6 s -> 49.0 s measured) without
    # touching float semantics (no fast-math — parity asserts unaffected).
    # Runtime of the tiny test models is negligible either way.
    flags = (flags + " --xla_backend_optimization_level=0").strip()
os.environ["XLA_FLAGS"] = flags
os.environ["JAX_PLATFORMS"] = "cpu"  # override ambient axon/tpu setting
# Keep compile cache deterministic + quiet in CI
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The axon TPU plugin rewrites jax_platforms to "axon,cpu" on import; force CPU
# after import so parity tests run with exact f32 math.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

_TESTS_RUN = [0]
_CLEAR_EVERY = int(os.environ.get("FASTVLM_TEST_CLEAR_EVERY", "60"))


@pytest.fixture(autouse=True)
def _periodic_jax_cache_clear():
    """XLA:CPU segfaults inside LLVM after ~185 compilations accumulate in one
    process (state-dependent; the same test passes in a fresh process — see
    CLAUDE.md). Dropping compiled-executable references every N tests keeps
    the per-process JIT state under the cliff at the cost of some recompiles."""
    yield
    _TESTS_RUN[0] += 1
    if _CLEAR_EVERY and _TESTS_RUN[0] % _CLEAR_EVERY == 0:
        jax.clear_caches()

