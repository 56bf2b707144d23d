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
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
