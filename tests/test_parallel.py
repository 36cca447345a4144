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


def test_sharded_kernel_decode_cnr2000(cnr2000_basename):
    """Fixture-scale multichip equality: the Pallas kernel decode sharded
    over the 8-device CPU mesh must reproduce the native oracle bit-exactly
    (the TPU analogue of the reference's parallel-vs-sequential oracle
    discipline, SURVEY §4.8)."""
    from webgraph_tpu import native
    from webgraph_tpu.ops import kdecode as K
    from webgraph_tpu.parallel.sharded import decode_sharded_kernel

    bv = BVGraph.load(cnr2000_basename)
    data = np.asarray(bv.data)
    outd = native.decode_outdegrees(data, bv.offsets,
                                    bv.settings.outdegree_coding)
    hco, hsu, refs = native.bv_decode_all_refs(
        data, bv.num_nodes, bv.num_arcs, bv.settings)
    prep = K.plan_kernel_decode(bv.offsets, outd, bv.settings, data,
                                halo_csr=(hco, hsu), refs=refs,
                                target_arcs_per_lane=128, v_cap=256,
                                r_cap=96)
    assert prep is not None
    mesh = make_mesh()
    out, diag = decode_sharded_kernel(prep, mesh)
    errs = K.check_diag(prep, np.asarray(diag))
    co, succ = K.chunked_to_csr(prep, np.asarray(out), data=data,
                                settings=bv.settings, errs=errs)
    np.testing.assert_array_equal(co, hco)
    np.testing.assert_array_equal(succ, hsu)
