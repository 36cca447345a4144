"""IntegerListImmutableGraph — the examples/ binary int-list format.

Parity with examples/IntegerListImmutableGraph (SURVEY §2.9): a trivial
binary format — big-endian ints: n, then per node the outdegree followed by
the successor list.  Used as an interchange/teaching format.
"""

from __future__ import annotations

import struct
from typing import Iterator, Tuple

import numpy as np

from ..core.graph import CSRGraph, ImmutableGraph, register_graph_class
from ..utils import properties as javaprops

__all__ = ["IntegerListImmutableGraph"]

GRAPH_EXTENSION = ".intlist"


@register_graph_class(
    "it.unimi.dsi.big.webgraph.examples.IntegerListImmutableGraph")
class IntegerListImmutableGraph(ImmutableGraph):
    def __init__(self, csr: CSRGraph):
        self._csr = csr
        self.properties = {}

    @property
    def num_nodes(self) -> int:
        return self._csr.num_nodes

    @property
    def num_arcs(self) -> int:
        return self._csr.num_arcs

    def successors(self, x: int) -> np.ndarray:
        return self._csr.successors(x)

    def iter_nodes(self, start: int = 0):
        return self._csr.iter_nodes(start)

    @classmethod
    def load(cls, basename: str, mode: str = "standard"
             ) -> "IntegerListImmutableGraph":
        raw = np.fromfile(basename + GRAPH_EXTENSION, dtype=">i8")
        n = int(raw[0])
        offs = np.zeros(n + 1, dtype=np.int64)
        lists = []
        p = 1
        for x in range(n):
            d = int(raw[p])
            p += 1
            lists.append(raw[p:p + d].astype(np.int64))
            p += d
        return cls(CSRGraph.from_lists(lists))

    @classmethod
    def store(cls, graph: ImmutableGraph, basename: str, **kw) -> None:
        out = [np.asarray([graph.num_nodes], dtype=np.int64)]
        for _, succ in graph.iter_nodes():
            out.append(np.asarray([len(succ)], dtype=np.int64))
            out.append(np.asarray(succ, dtype=np.int64))
        np.concatenate(out).astype(">i8").tofile(basename + GRAPH_EXTENSION)
        javaprops.dump({
            "graphclass":
                "it.unimi.dsi.big.webgraph.examples.IntegerListImmutableGraph",
            "nodes": str(graph.num_nodes),
        }, basename + ".properties", "IntegerListImmutableGraph properties")
