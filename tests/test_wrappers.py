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
