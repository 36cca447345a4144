"""Graph wrappers / views (SURVEY §2.5).

- :class:`ImmutableSubgraph` — induced subgraph over a sorted node subset
  with to/from-supergraph mapping and its own on-disk family
  (ImmutableSubgraph.java:49-95: ``.properties`` + ``.subgraphnodes``).
- :class:`UnionImmutableGraph` — lazy arc union view of two graphs
  (UnionImmutableGraph.java:35).
- :class:`BidirectionalImmutableGraph` — pairs a graph with its transpose
  for indegrees/predecessors/symmetric views
  (BidirectionalImmutableGraph.java:27).
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, Optional, Tuple

import numpy as np

from .graph import CSRGraph, ImmutableGraph, load as load_graph, \
    register_graph_class
from ..utils import properties as javaprops

__all__ = ["ImmutableSubgraph", "UnionImmutableGraph",
           "BidirectionalImmutableGraph", "induced_subgraph"]

SUBGRAPHNODES_EXTENSION = ".subgraphnodes"


def induced_subgraph(g: ImmutableGraph, nodes: np.ndarray) -> CSRGraph:
    """Materialized induced subgraph with nodes renumbered 0..k-1.

    Fully vectorized over CSR-backed graphs (one gather + one searchsorted
    membership test over the subset's arcs); other graphs fall back to a
    per-node scan whose membership test is still a vectorized searchsorted
    (no per-arc Python)."""
    nodes = np.unique(np.asarray(nodes, dtype=np.int64))
    k = len(nodes)
    if isinstance(g, CSRGraph):
        off = np.asarray(g.offsets, dtype=np.int64)
        succ = np.asarray(g.succ, dtype=np.int64)
        cnt = off[nodes + 1] - off[nodes]
        tot = int(cnt.sum())
        idx = (np.repeat(off[nodes], cnt)
               + np.arange(tot, dtype=np.int64)
               - np.repeat(np.cumsum(cnt) - cnt, cnt))
        sup = succ[idx]
        pos = np.searchsorted(nodes, sup)
        posc = np.minimum(pos, k - 1) if k else pos
        keep = (pos < k) & (nodes[posc] == sup) if k else pos < k
        row = np.repeat(np.arange(k, dtype=np.int64), cnt)[keep]
        new_off = np.zeros(k + 1, dtype=np.int64)
        new_off[1:] = np.bincount(row, minlength=k)
        np.cumsum(new_off, out=new_off)
        return CSRGraph(new_off, pos[keep].astype(np.int64), num_nodes=k)
    lists = []
    for x in nodes.tolist():
        sup = np.asarray(g.successors(x), dtype=np.int64)
        pos = np.searchsorted(nodes, sup)
        posc = np.minimum(pos, k - 1) if k else pos
        keep = (pos < k) & (nodes[posc] == sup) if k else pos < k
        lists.append(pos[keep].astype(np.int64))
    return CSRGraph.from_lists(lists)


@register_graph_class(
    "it.unimi.dsi.big.webgraph.ImmutableSubgraph",
    "it.unimi.dsi.webgraph.ImmutableSubgraph",
)
class ImmutableSubgraph(ImmutableGraph):
    """Induced-subgraph view over a sorted node subset.

    Node i of the subgraph is ``nodes[i]`` of the supergraph; successors are
    the supergraph successors that fall in the subset, renumbered."""

    def __init__(self, supergraph: ImmutableGraph, nodes: np.ndarray,
                 properties: Optional[Dict[str, str]] = None):
        self.supergraph = supergraph
        self.nodes = np.asarray(nodes, dtype=np.int64)
        assert np.all(np.diff(self.nodes) > 0), "node subset must be sorted"
        self.properties = properties or {}

    @property
    def num_nodes(self) -> int:
        return len(self.nodes)

    @property
    def num_arcs(self) -> int:
        m = 0
        for _, succ in self.iter_nodes():
            m += len(succ)
        return m

    def to_supergraph_node(self, x: int) -> int:
        return int(self.nodes[x])

    def from_supergraph_node(self, y: int) -> int:
        i = int(np.searchsorted(self.nodes, y))
        if i >= len(self.nodes) or self.nodes[i] != y:
            raise ValueError(f"node {y} not in subgraph")
        return i

    def successors(self, x: int) -> np.ndarray:
        sup = self.supergraph.successors(int(self.nodes[x]))
        idx = np.searchsorted(self.nodes, sup)
        idx = np.minimum(idx, len(self.nodes) - 1)
        keep = self.nodes[idx] == sup
        return idx[keep].astype(np.int64)

    def iter_nodes(self, start: int = 0) -> Iterator[Tuple[int, np.ndarray]]:
        for x in range(start, len(self.nodes)):
            yield x, self.successors(x)

    # -- persistence (ImmutableSubgraph.java:49-95 file family) ----------

    @classmethod
    def store(cls, supergraph_basename: str, nodes: np.ndarray,
              basename: str) -> None:
        nodes = np.asarray(nodes, dtype=np.int64)
        nodes.astype(">i8").tofile(basename + SUBGRAPHNODES_EXTENSION)
        javaprops.dump({
            "graphclass": "it.unimi.dsi.big.webgraph.ImmutableSubgraph",
            "supergraphbasename": supergraph_basename,
            "subgraphnodes": os.path.basename(basename)
                             + SUBGRAPHNODES_EXTENSION,
        }, basename + ".properties", "ImmutableSubgraph properties")

    @classmethod
    def load(cls, basename: str, mode: str = "standard"
             ) -> "ImmutableSubgraph":
        props = javaprops.load(basename + ".properties")
        super_name = props["supergraphbasename"]
        if not os.path.isabs(super_name):
            super_name = os.path.join(os.path.dirname(basename), super_name)
        supergraph = load_graph(super_name, mode=mode)
        nodes = np.fromfile(basename + SUBGRAPHNODES_EXTENSION,
                            dtype=">i8").astype(np.int64)
        return cls(supergraph, nodes, props)


class UnionImmutableGraph(ImmutableGraph):
    """Lazy arc-union view (UnionImmutableGraph.java:35)."""

    def __init__(self, g0: ImmutableGraph, g1: ImmutableGraph):
        self.g0 = g0
        self.g1 = g1
        self.properties = {}

    @property
    def num_nodes(self) -> int:
        return max(self.g0.num_nodes, self.g1.num_nodes)

    @property
    def num_arcs(self) -> int:
        m = 0
        for _, succ in self.iter_nodes():
            m += len(succ)
        return m

    def successors(self, x: int) -> np.ndarray:
        parts = []
        if x < self.g0.num_nodes:
            parts.append(self.g0.successors(x))
        if x < self.g1.num_nodes:
            parts.append(self.g1.successors(x))
        if not parts:
            return np.zeros(0, dtype=np.int64)
        return np.unique(np.concatenate(parts))

    def iter_nodes(self, start: int = 0):
        for x in range(start, self.num_nodes):
            yield x, self.successors(x)


class BidirectionalImmutableGraph(ImmutableGraph):
    """A graph paired with its transpose (BidirectionalImmutableGraph.java:27)."""

    def __init__(self, graph: ImmutableGraph, transpose: ImmutableGraph):
        assert graph.num_nodes == transpose.num_nodes
        self.forward = graph
        self.backward = transpose
        self.properties = {}

    @property
    def num_nodes(self) -> int:
        return self.forward.num_nodes

    @property
    def num_arcs(self) -> int:
        return self.forward.num_arcs

    def successors(self, x: int) -> np.ndarray:
        return self.forward.successors(x)

    def predecessors(self, x: int) -> np.ndarray:
        return self.backward.successors(x)

    def outdegree(self, x: int) -> int:
        return self.forward.outdegree(x)

    def indegree(self, x: int) -> int:
        return self.backward.outdegree(x)

    def iter_nodes(self, start: int = 0):
        return self.forward.iter_nodes(start)

    def symmetrized(self) -> UnionImmutableGraph:
        """The union with the transpose (symmetric view)."""
        return UnionImmutableGraph(self.forward, self.backward)
