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

import pathlib

import pytest

REFERENCE = pathlib.Path("/root/reference")
CNR2000 = REFERENCE / "slow/it/unimi/dsi/big/webgraph/cnr-2000"


@pytest.fixture(scope="session")
def cnr2000_basename():
    if not CNR2000.with_suffix(".graph").exists():
        pytest.skip("cnr-2000 fixture not available")
    return str(CNR2000)
