"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

The TPU build's analogue of the reference's (absent) distributed testing:
single-chip vs multi-chip decode equality (SURVEY §4.8).
"""

import jax
import numpy as np
import pytest

from webgraph_tpu.codecs.bvgraph import BVGraph
from webgraph_tpu.ops import vdecode
from webgraph_tpu.parallel.sharded import decode_sharded, make_mesh

from .graphs import erdos_renyi


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("seed", [0, 1])
def test_sharded_decode_matches_oracle(tmp_path, seed):
    g = erdos_renyi(400, 0.04, seed=seed)
    base = str(tmp_path / "g")
    BVGraph.store(g, base)
    bv = BVGraph.load(base)
    cfg = vdecode.config_from_settings(bv.settings, batch=128)
    mesh = make_mesh()
    co, succ = decode_sharded(np.asarray(bv.data), bv.offsets, cfg, mesh)
    exp = g.to_csr()
    np.testing.assert_array_equal(co, exp.offsets)
    np.testing.assert_array_equal(succ, exp.succ)


def test_sharded_decode_windowless(tmp_path):
    g = erdos_renyi(200, 0.05, seed=2)
    base = str(tmp_path / "g")
    BVGraph.store(g, base, window_size=0)
    bv = BVGraph.load(base)
    cfg = vdecode.config_from_settings(bv.settings, batch=64)
    mesh = make_mesh()
    co, succ = decode_sharded(np.asarray(bv.data), bv.offsets, cfg, mesh)
    exp = g.to_csr()
    np.testing.assert_array_equal(succ, exp.succ)
