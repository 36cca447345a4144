"""Test configuration.

Tests run on a virtual 8-device CPU mesh so that multi-chip sharding paths
are exercised without TPU hardware (the driver separately dry-runs the
multi-chip path; benchmarks run on the real chip).
"""

import os
import sys

# Must be set before jax is imported anywhere.  The environment's
# sitecustomize pins JAX_PLATFORMS=axon (the TPU tunnel); tests must run on
# a virtual 8-device CPU mesh, so override unconditionally.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The environment's sitecustomize imports jax during interpreter startup, so
# the env var alone is captured too late; force the platform via the config.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# XLA CPU compilation dominates suite wall-time (minutes of compiles per
# run); the persistent cache makes repeat runs compile-free.
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pathlib

import pytest

REFERENCE = pathlib.Path("/root/reference")
CNR2000 = REFERENCE / "slow/it/unimi/dsi/big/webgraph/cnr-2000"


@pytest.fixture(scope="session")
def cnr2000_basename():
    if not CNR2000.with_suffix(".graph").exists():
        pytest.skip("cnr-2000 fixture not available")
    return str(CNR2000)


@pytest.fixture(autouse=True, scope="module")
def _jax_cache_reset_per_module():
    """Free per-module jit/program caches: the full suite otherwise
    accumulates enough XLA:CPU client state to crash late modules
    (observed as a segfault inside backend_compile around the 80% mark).
    Recompiles are cheap — programs reload from the persistent cache."""
    yield
    jax.clear_caches()
