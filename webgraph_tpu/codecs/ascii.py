"""ASCII import/export formats.

- :class:`ASCIIGraph` — ``basename.graph-txt``: first line n, then one line
  of sorted successors per node (reference ASCIIGraph.java:55-70).
- :class:`ArcListASCIIGraph` — one arc per line, sources nondecreasing,
  optional shift (reference ArcListASCIIGraph.java:54-75).
"""

from __future__ import annotations

import gzip
import os
from typing import IO, Iterator, Optional, Tuple

import numpy as np

from ..core.graph import CSRGraph, ImmutableGraph, register_graph_class
from ..utils import properties as javaprops

__all__ = ["ASCIIGraph", "ArcListASCIIGraph", "ShiftedByOneArcListASCIIGraph"]

GRAPH_TXT_EXTENSION = ".graph-txt"


def _open_text(path: str) -> IO[str]:
    if path.endswith(".gz"):
        return gzip.open(path, "rt")
    return open(path, "r")


@register_graph_class(
    "it.unimi.dsi.big.webgraph.ASCIIGraph",
    "it.unimi.dsi.webgraph.ASCIIGraph",
)
class ASCIIGraph(ImmutableGraph):
    """Offline ``.graph-txt`` graph: sequential access backed by the file."""

    def __init__(self, path: str, num_nodes: int):
        self.path = path
        self._n = num_nodes
        self.properties = {"graphclass": "it.unimi.dsi.big.webgraph.ASCIIGraph",
                           "nodes": str(num_nodes)}

    @property
    def num_nodes(self) -> int:
        return self._n

    @property
    def num_arcs(self) -> int:
        m = 0
        for _, succ in self.iter_nodes():
            m += len(succ)
        return m

    @property
    def random_access(self) -> bool:
        return False

    def successors(self, x: int) -> np.ndarray:
        raise RuntimeError("ASCIIGraph is sequential-only; use to_csr()")

    def iter_nodes(self, start: int = 0) -> Iterator[Tuple[int, np.ndarray]]:
        with _open_text(self.path) as f:
            n = int(f.readline())
            assert n == self._n
            for x in range(n):
                line = f.readline()
                succ = (np.fromstring(line, dtype=np.int64, sep=" ")
                        if line.strip() else np.zeros(0, dtype=np.int64))
                if x >= start:
                    yield x, succ

    @classmethod
    def load(cls, basename: str, mode: str = "offline") -> "ImmutableGraph":
        path = basename + GRAPH_TXT_EXTENSION
        if not os.path.exists(path) and os.path.exists(path + ".gz"):
            path += ".gz"
        with _open_text(path) as f:
            n = int(f.readline())
        g = cls(path, n)
        if mode in ("standard", "mapped"):
            return g.to_csr()
        return g

    @classmethod
    def load_once(cls, stream: IO[str]) -> Iterator[Tuple[int, np.ndarray]]:
        """Single-pass streaming parse from an open text stream."""
        n = int(stream.readline())
        for x in range(n):
            line = stream.readline()
            yield x, (np.fromstring(line, dtype=np.int64, sep=" ")
                      if line.strip() else np.zeros(0, dtype=np.int64))

    @classmethod
    def store(cls, graph: ImmutableGraph, basename: str, **kwargs) -> None:
        with open(basename + GRAPH_TXT_EXTENSION, "w") as f:
            f.write(f"{graph.num_nodes}\n")
            for _, succ in graph.iter_nodes():
                f.write(" ".join(map(str, succ.tolist())))
                f.write("\n")


@register_graph_class(
    "it.unimi.dsi.big.webgraph.ArcListASCIIGraph",
    "it.unimi.dsi.webgraph.ArcListASCIIGraph",
)
class ArcListASCIIGraph(ImmutableGraph):
    """One arc per line ("source<TAB-or-space>target"), sources nondecreasing.

    ``shift`` is added to every id on input (ArcListASCIIGraph.java:54-75).
    The number of nodes is one plus the largest id seen.
    """

    def __init__(self, path: str, shift: int = 0):
        self.path = path
        self.shift = shift
        self._csr: Optional[CSRGraph] = None
        self.properties = {}

    def _materialize(self) -> CSRGraph:
        if self._csr is None:
            src_list, tgt_list = [], []
            with _open_text(self.path) as f:
                for line in f:
                    line = line.strip()
                    if not line or line.startswith("#"):
                        continue
                    a, b = line.split()
                    src_list.append(int(a) + self.shift)
                    tgt_list.append(int(b) + self.shift)
            src = np.asarray(src_list, dtype=np.int64)
            tgt = np.asarray(tgt_list, dtype=np.int64)
            if len(src) and np.any(np.diff(src) < 0):
                raise ValueError("sources must be nondecreasing")
            n = int(max(src.max(initial=-1), tgt.max(initial=-1))) + 1
            self._csr = CSRGraph.from_arcs(src, tgt, n, dedup=False)
        return self._csr

    @property
    def num_nodes(self) -> int:
        return self._materialize().num_nodes

    @property
    def num_arcs(self) -> int:
        return self._materialize().num_arcs

    def successors(self, x: int) -> np.ndarray:
        return self._materialize().successors(x)

    def iter_nodes(self, start: int = 0):
        return self._materialize().iter_nodes(start)

    @classmethod
    def load(cls, basename: str, mode: str = "standard", shift: int = 0):
        g = cls(basename, shift=shift)
        if mode in ("standard", "mapped"):
            return g._materialize()
        return g

    @classmethod
    def store(cls, graph: ImmutableGraph, basename: str, shift: int = 0,
              **kwargs) -> None:
        with open(basename, "w") as f:
            for x, succ in graph.iter_nodes():
                for t in succ.tolist():
                    f.write(f"{x + shift}\t{t + shift}\n")


@register_graph_class("it.unimi.dsi.big.webgraph.ShiftedByOneArcListASCIIGraph")
class ShiftedByOneArcListASCIIGraph(ArcListASCIIGraph):
    """Arc-list variant with ids starting from 1 (shift = -1 on load)."""

    @classmethod
    def load(cls, basename: str, mode: str = "standard", shift: int = -1):
        return ArcListASCIIGraph.load(basename, mode=mode, shift=-1)

    @classmethod
    def store(cls, graph: ImmutableGraph, basename: str, **kwargs) -> None:
        ArcListASCIIGraph.store(graph, basename, shift=1)
