"""Ecosystem adapters — the analogue of the reference's standard<->big
wrappers (ImmutableGraph.wrap, ImmutableGraph.java:920/:1039, which bridge
the int-node and long-node webgraph worlds).

This framework's neighbouring ecosystems are the Python array/graph
libraries instead: scipy.sparse adjacency matrices, NetworkX digraphs, and
raw edge arrays all wrap into :class:`~webgraph_tpu.core.graph.CSRGraph`
(the universal interchange format) and back, so any reference workflow
(compress / transform / analyze) can start or end outside the framework.
"""

from __future__ import annotations

import numpy as np

from .graph import CSRGraph, ImmutableGraph

__all__ = ["wrap", "from_scipy", "to_scipy", "from_networkx",
           "to_networkx", "from_edges"]


def from_scipy(mat) -> CSRGraph:
    """Wrap a scipy.sparse matrix (any format) as a graph: nonzero (i, j)
    becomes the arc i -> j; successor lists come out sorted/deduped."""
    m = mat.tocsr()
    n = max(m.shape)
    indptr = np.asarray(m.indptr, dtype=np.int64)
    if m.shape[0] < n:
        indptr = np.concatenate([
            indptr, np.full(n - m.shape[0], indptr[-1], dtype=np.int64)])
    indices = np.asarray(m.indices, dtype=np.int64)
    # csr column indices are not guaranteed sorted; normalize via arc sort
    src = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
    return CSRGraph.from_arcs(src, indices, n)


def to_scipy(g: ImmutableGraph):
    """The inverse adapter: graph -> scipy.sparse.csr_matrix of 1s."""
    from scipy import sparse

    c = g.to_csr()
    return sparse.csr_matrix(
        (np.ones(c.num_arcs, dtype=np.int8), c.succ.astype(np.int64),
         c.offsets), shape=(c.num_nodes, c.num_nodes))


def from_networkx(nxg) -> CSRGraph:
    """Wrap a NetworkX (Di)Graph with integer-labelable nodes; nodes are
    relabelled densely in sorted order."""
    nodes = sorted(nxg.nodes())
    idx = {v: i for i, v in enumerate(nodes)}
    src = np.asarray([idx[u] for u, _ in nxg.edges()], dtype=np.int64)
    tgt = np.asarray([idx[v] for _, v in nxg.edges()], dtype=np.int64)
    if not nxg.is_directed():
        src, tgt = np.concatenate([src, tgt]), np.concatenate([tgt, src])
    return CSRGraph.from_arcs(src, tgt, len(nodes))


def to_networkx(g: ImmutableGraph):
    """The inverse adapter: graph -> networkx.DiGraph."""
    import networkx as nx

    out = nx.DiGraph()
    out.add_nodes_from(range(g.num_nodes))
    for x, succ in g.iter_nodes():
        out.add_edges_from((x, int(t)) for t in succ)
    return out


def from_edges(edges, num_nodes: int = -1) -> CSRGraph:
    """Wrap an (m, 2) array-like of arcs."""
    e = np.asarray(edges, dtype=np.int64).reshape(-1, 2)
    if num_nodes < 0:
        num_nodes = int(e.max(initial=-1)) + 1
    return CSRGraph.from_arcs(e[:, 0], e[:, 1], num_nodes)


def wrap(obj, num_nodes: int = -1) -> CSRGraph:
    """Polymorphic adapter (the ImmutableGraph.wrap analogue): accepts a
    CSRGraph/ImmutableGraph (pass-through to CSR), a scipy.sparse matrix,
    a NetworkX graph, or an (m, 2) edge array."""
    if isinstance(obj, ImmutableGraph):
        return obj.to_csr()
    if hasattr(obj, "tocsr"):
        return from_scipy(obj)
    if hasattr(obj, "edges") and hasattr(obj, "nodes"):
        return from_networkx(obj)
    return from_edges(obj, num_nodes)
