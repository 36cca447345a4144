"""Test configuration.

Tests run on a virtual 8-device CPU mesh so that multi-chip sharding paths
are exercised without TPU hardware (the driver separately dry-runs the
multi-chip path; benchmarks run on the real chip).
"""

import os
import sys

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pathlib

import pytest

REFERENCE = pathlib.Path("/root/reference")
CNR2000 = REFERENCE / "slow/it/unimi/dsi/big/webgraph/cnr-2000"


@pytest.fixture(scope="session")
def cnr2000_basename():
    if not CNR2000.with_suffix(".graph").exists():
        pytest.skip("cnr-2000 fixture not available")
    return str(CNR2000)
