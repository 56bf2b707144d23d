"""Test harness config: force an 8-device virtual CPU mesh.

Multi-chip sharding logic is exercised on virtual CPU devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8), mirroring how the
driver dry-runs the multi-chip path; real-TPU benchmarking happens via
bench.py, not the test suite.
"""

import os
import sys

# NOTE: the axon TPU plugin in this image ignores JAX_PLATFORMS; the legacy
# JAX_PLATFORM_NAME (and jax.config jax_platforms) do take effect.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
# never enable the CLI's persistent XLA compilation cache inside the test
# process: a cache entry written by another MACHINE loads as foreign-ISA
# XLA:CPU AOT code and segfaults mid-suite (observed round 3 — round-2
# cache entries met a new host; tests must also be hermetic)
os.environ["IHMR_NO_COMPILE_CACHE"] = "1"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables after every test module.

    Each XLA:CPU executable pins multiple mmap regions; accumulated over the
    full ~250-test suite the process crosses the kernel's vm.max_map_count
    (65530 default) and the NEXT large compile segfaults inside LLVM
    (diagnosed round 3: ~59k maps right before a deterministic crash in
    test_train). Compiled programs are rarely shared across modules, so the
    recompile cost is small; the map count stays bounded."""
    yield
    jax.clear_caches()


def _map_count() -> int:
    try:
        with open("/proc/self/maps", "rb") as f:
            return sum(1 for _ in f)
    except OSError:  # non-Linux fallback: never trips the guard
        return 0


@pytest.fixture(autouse=True)
def _map_count_guard():
    """Per-TEST backstop for the same vm.max_map_count crash: a single heavy
    module (test_opt_engine compiles dozens of full-engine programs) can
    cross the limit before its module-scope clear runs (observed round 5:
    deterministic SIGSEGV inside LLVM during the escalation test's pass-2
    compile at ~46% of the suite). Reading /proc/self/maps is ~1 ms; clear
    as soon as the process nears the default 65530 ceiling."""
    yield
    if _map_count() > 45000:
        jax.clear_caches()
