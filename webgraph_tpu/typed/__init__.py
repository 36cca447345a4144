"""Typed graphs (SURVEY §2.8).

Nodes carry a type in the 16 high bits and an id-within-type in the low 48
(TypedGraph.java:35-63).  A typed graph is stored as one compressed stream
per type (BVImmutableTypedGraph.java:45-75) plus a *type graph* describing
which types point to which.

- :func:`node` / :func:`node_type` / :func:`node_id` — packing helpers.
- :func:`convert_to_typed` — split any graph + node->type map into per-type
  BVGraph streams with successors rewritten to packed typed ids, plus the
  per-type ``.ids`` mapping files (ConvertToTypedGraph.java:61-66).
- :class:`BVTypedGraph` — load and random-access the per-type family.
- :func:`estimate_typed_graph_size` — size estimate of the typed split
  (EstimateTypedGraphSize.java:49).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from ..codecs.bvgraph import BVGraph, BVGraphSettings
from ..core.graph import CSRGraph, ImmutableGraph
from ..utils import properties as javaprops

__all__ = ["ID_BITS", "node", "node_type", "node_id", "convert_to_typed",
           "BVTypedGraph", "estimate_typed_graph_size"]

ID_BITS = 48
_ID_MASK = (1 << ID_BITS) - 1


def node(t: int, i: int) -> int:
    """Pack (type, id) into a typed node (TypedGraph.node :60)."""
    return (t << ID_BITS) | i


def node_type(x: int) -> int:
    return x >> ID_BITS


def node_id(x: int) -> int:
    return x & _ID_MASK


def convert_to_typed(g: ImmutableGraph, types: np.ndarray, basename: str,
                     settings: Optional[BVGraphSettings] = None) -> Dict:
    """Split ``g`` into per-type streams.

    ``types[x]`` is the type of node x.  Nodes of each type get local ids in
    node order; per-type ``.ids`` files record the original node of each
    local id; successors are rewritten to packed typed ids.  Writes
    ``basename-<t>.{graph,offsets,properties}``, ``basename-<t>.ids`` and a
    master ``basename.properties``.
    """
    types = np.asarray(types, dtype=np.int64)
    n = g.num_nodes
    assert len(types) == n
    num_types = int(types.max(initial=-1)) + 1
    local = np.zeros(n, dtype=np.int64)
    counts = np.zeros(num_types, dtype=np.int64)
    for x in range(n):
        local[x] = counts[types[x]]
        counts[types[x]] += 1
    packed = (types << ID_BITS) | local  # original node -> typed node

    per_type_lists: List[List[np.ndarray]] = [[] for _ in range(num_types)]
    type_arcs = set()
    m = 0
    for x, succ in g.iter_nodes():
        t = int(types[x])
        rewritten = np.sort(packed[succ]) if len(succ) else succ
        per_type_lists[t].append(rewritten.astype(np.int64))
        m += len(succ)
        for st in np.unique(types[succ]).tolist():
            type_arcs.add((t, int(st)))

    for t in range(num_types):
        sub = CSRGraph.from_lists(per_type_lists[t])
        BVGraph.store(sub, f"{basename}-{t}", settings=settings)
        orig = np.flatnonzero(types == t).astype(np.int64)
        orig.astype(">i8").tofile(f"{basename}-{t}.ids")

    # the type graph: arcs between types
    tg_lists = [np.asarray(sorted(s for (a, s) in type_arcs if a == t),
                           dtype=np.int64) for t in range(num_types)]
    tg = CSRGraph.from_lists(tg_lists)
    props = {
        "graphclass": "it.unimi.dsi.big.webgraph.typed.BVImmutableTypedGraph",
        "types": str(num_types),
        "nodes": str(n),
        "arcs": str(m),
        "typecounts": ",".join(str(int(c)) for c in counts),
        "typegraph": ";".join(",".join(map(str, l.tolist()))
                              for l in tg_lists),
    }
    javaprops.dump(props, basename + ".properties",
                   "BVImmutableTypedGraph properties")
    return props


class BVTypedGraph:
    """Per-type compressed streams with packed-typed-id access
    (BVImmutableTypedGraph.java:45)."""

    def __init__(self, basename: str):
        props = javaprops.load(basename + ".properties")
        self.properties = props
        self.num_types = int(props["types"])
        self._n = int(props["nodes"])
        self._m = int(props["arcs"])
        self.type_counts = np.asarray(
            [int(c) for c in props["typecounts"].split(",")], dtype=np.int64)
        self.graphs = [BVGraph.load(f"{basename}-{t}")
                       for t in range(self.num_types)]
        self.ids = [np.fromfile(f"{basename}-{t}.ids", dtype=">i8")
                    .astype(np.int64) for t in range(self.num_types)]
        tg_lists = []
        spec = props.get("typegraph", "")
        for part in spec.split(";") if spec else []:
            tg_lists.append(np.asarray(
                [int(v) for v in part.split(",") if v], dtype=np.int64))
        while len(tg_lists) < self.num_types:
            tg_lists.append(np.zeros(0, dtype=np.int64))
        self._type_graph = CSRGraph.from_lists(tg_lists)

    def type_graph(self) -> CSRGraph:
        return self._type_graph

    @property
    def num_nodes(self) -> int:
        return self._n

    def num_nodes_of_type(self, t: int) -> int:
        return int(self.type_counts[t])

    @property
    def num_arcs(self) -> int:
        return self._m

    def outdegree(self, x: int) -> int:
        return self.graphs[node_type(x)].outdegree(node_id(x))

    def successors(self, x: int) -> np.ndarray:
        """Successors of a packed typed node, as packed typed nodes."""
        return self.graphs[node_type(x)].successors(node_id(x))

    def original_node(self, x: int) -> int:
        """Map a typed node back to the pre-split node id."""
        return int(self.ids[node_type(x)][node_id(x)])


def estimate_typed_graph_size(g: ImmutableGraph, types: np.ndarray
                              ) -> Dict[str, float]:
    """Rough per-type compressed-size estimate (gap entropy bound), the
    planning role of EstimateTypedGraphSize.java:49."""
    types = np.asarray(types, dtype=np.int64)
    num_types = int(types.max(initial=-1)) + 1
    local = np.zeros(g.num_nodes, dtype=np.int64)
    counts = np.zeros(num_types, dtype=np.int64)
    for x in range(g.num_nodes):
        local[x] = counts[types[x]]
        counts[types[x]] += 1
    packed = (types << ID_BITS) | local
    bits = np.zeros(num_types)
    for x, succ in g.iter_nodes():
        if not len(succ):
            continue
        vals = np.sort(packed[succ] & _ID_MASK)
        gaps = np.diff(vals, prepend=0) + 1
        bits[types[x]] += float(np.sum(2 * np.floor(np.log2(gaps)) + 1))
    return {"bits_per_type": bits, "total_bits": float(bits.sum()),
            "nodes_per_type": counts}
