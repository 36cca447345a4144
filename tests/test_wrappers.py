"""Wrapper/view tests (ImmutableSubgraphTest, UnionImmutableGraphTest parity)."""

import numpy as np
import pytest

from webgraph_tpu.codecs.bvgraph import BVGraph
from webgraph_tpu.core import graph as core
from webgraph_tpu.core.wrappers import (
    BidirectionalImmutableGraph,
    ImmutableSubgraph,
    UnionImmutableGraph,
    induced_subgraph,
)
from webgraph_tpu import transform as T

from .graphs import cycle_graph, erdos_renyi, star_graph


def test_induced_subgraph():
    g = erdos_renyi(50, 0.2, seed=0)
    nodes = np.arange(0, 50, 2)
    sub = induced_subgraph(g, nodes)
    assert sub.num_nodes == 25
    for i, x in enumerate(nodes.tolist()):
        expected = sorted(np.searchsorted(nodes, t)
                          for t in g.successors(x).tolist()
                          if t in set(nodes.tolist()))
        assert sub.successors(i).tolist() == expected


def test_subgraph_view_and_mapping():
    g = erdos_renyi(40, 0.2, seed=1)
    nodes = np.asarray([1, 5, 9, 13, 17, 21], dtype=np.int64)
    sub = ImmutableSubgraph(g, nodes)
    assert sub.to_supergraph_node(2) == 9
    assert sub.from_supergraph_node(13) == 3
    with pytest.raises(ValueError):
        sub.from_supergraph_node(2)
    # view equals materialized induced subgraph
    mat = induced_subgraph(g, nodes)
    assert mat.equals(sub.to_csr())


def test_subgraph_files(tmp_path):
    g = erdos_renyi(60, 0.1, seed=2)
    base = str(tmp_path / "g")
    BVGraph.store(g, base)
    nodes = np.arange(0, 60, 5)
    ImmutableSubgraph.store("g", nodes, str(tmp_path / "sub"))
    loaded = core.load(str(tmp_path / "sub"))
    assert isinstance(loaded, ImmutableSubgraph)
    assert loaded.num_nodes == len(nodes)
    assert loaded.to_csr().equals(induced_subgraph(g, nodes))


def test_union_view():
    g0, g1 = cycle_graph(8), star_graph(8)
    u = UnionImmutableGraph(g0, g1)
    assert u.to_csr().equals(T.union(g0, g1))
    assert u.num_arcs == T.union(g0, g1).num_arcs


def test_bidirectional():
    g = erdos_renyi(30, 0.15, seed=3)
    bd = BidirectionalImmutableGraph(g, T.transpose(g))
    for x in range(30):
        np.testing.assert_array_equal(bd.successors(x), g.successors(x))
        preds = sorted(y for y in range(30) if x in g.successors(y))
        assert bd.predecessors(x).tolist() == preds
        assert bd.indegree(x) == len(preds)
    sym = bd.symmetrized()
    assert sym.to_csr().equals(T.symmetrize(g))


def test_wrap_adapters_roundtrip():
    """Ecosystem adapters (the ImmutableGraph.wrap analogue,
    ImmutableGraph.java:920/:1039): scipy / networkx / edge arrays."""
    import numpy as np
    from webgraph_tpu.core import wrap as W

    from .graphs import erdos_renyi
    g = erdos_renyi(60, 0.1, seed=1).to_csr()
    # scipy roundtrip
    sp = W.to_scipy(g)
    g2 = W.from_scipy(sp)
    assert g2.equals(g)
    assert W.wrap(sp).equals(g)
    # networkx roundtrip
    nxg = W.to_networkx(g)
    g3 = W.from_networkx(nxg)
    assert g3.equals(g)
    assert W.wrap(nxg).equals(g)
    # edges
    src = np.repeat(np.arange(60), np.diff(g.offsets))
    e = np.stack([src, g.succ], axis=1)
    assert W.wrap(e, 60).equals(g)
    # pass-through
    assert W.wrap(g) is g
