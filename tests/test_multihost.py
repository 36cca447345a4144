"""Multi-host encode shards + per-host decode plans (parallel/multihost).

The shard semantics mirror the reference's per-thread compression exactly
(window resets at range bounds, bit-exact concatenation,
BVGraph.java:2373-2483) promoted from threads to hosts, so the merged
output must be byte-identical to an n-thread native encode.
"""

import numpy as np
import pytest

from webgraph_tpu import native
from webgraph_tpu.codecs.bvgraph import BVGraph, BVGraphSettings
from webgraph_tpu.core.graph import CSRGraph
from webgraph_tpu.ops import kdecode as K
from webgraph_tpu.parallel import multihost as MH

from .graphs import erdos_renyi

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libwgnative.so not built")


@pytest.mark.parametrize("hosts", [2, 4])
def test_store_multihost_matches_threaded_encode(tmp_path, hosts):
    g = erdos_renyi(600, 0.03, seed=13).to_csr()
    s = BVGraphSettings()
    base = str(tmp_path / "mh")
    props = MH.store_multihost(g, base, hosts, settings=s)
    # the merged stream == a native encode whose thread ranges are the
    # same shard bounds; with arc-balanced bounds both sides use the same
    # split, so compare against threads=hosts
    g2, gb2, _o2, _ob2, _st2 = native.bv_encode(
        np.asarray(g.offsets), np.asarray(g.succ), s, threads=hosts)
    got = open(base + ".graph", "rb").read()
    assert got == g2.tobytes()[:len(got)]
    assert int(props["arcs"]) == g.num_arcs
    # and the merged artifact loads + decodes equal to the source
    bv = BVGraph.load(base)
    co, su = native.bv_decode_all(np.asarray(bv.data), bv.num_nodes,
                                  bv.num_arcs, bv.settings)
    np.testing.assert_array_equal(co, g.offsets)
    np.testing.assert_array_equal(su, g.succ)


def test_shard_bounds_cover():
    co = np.concatenate([[0], np.cumsum(np.random.default_rng(0)
                                        .integers(0, 9, 500))])
    b = MH.shard_bounds(co, 7)
    assert b[0] == 0 and b[-1] == 500
    assert (np.diff(b) >= 0).all()


def test_plan_shard_decode_partitions(tmp_path):
    g = erdos_renyi(500, 0.04, seed=5)
    base = str(tmp_path / "g")
    BVGraph.store(g, base)
    bv = BVGraph.load(base)
    data = np.asarray(bv.data)
    exp = g.to_csr()
    got = []
    for k in range(2):
        prep, lo, hi = MH.plan_shard_decode(bv, data, k, 2)
        assert prep is not None
        out, diag, hv = K.decode_full(prep)
        errs = K.check_diag(prep, diag)
        assert not errs.any()
        co, su = K.chunked_to_csr(prep, out, data=data,
                                  settings=bv.settings, errs=errs,
                                  hub_vals=hv)
        np.testing.assert_array_equal(
            co, exp.offsets[lo:hi + 1] - exp.offsets[lo])
        got.append(su)
    np.testing.assert_array_equal(np.concatenate(got), exp.succ)


def test_initialize_single_process(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert MH.initialize() == (0, 1)
