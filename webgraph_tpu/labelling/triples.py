"""IntegerTriplesArcLabelledImmutableGraph — the reference's worked example
(examples/IntegerTriplesArcLabelledImmutableGraph.java:55-120): a list of
(source, target, label) integer triples exposed as an arc-labelled graph
with gamma-coded nonnegative integer labels, plus the main-method behavior
of reading TAB-separated triples and storing BVGraph +
BitStreamArcLabelledImmutableGraph."""

from __future__ import annotations

from typing import IO, Union

import numpy as np

from ..core.graph import CSRGraph
from .graph import ArcLabelledGraph, BitStreamArcLabelledGraph
from .labels import GammaCodedIntLabel

__all__ = ["integer_triples_graph", "store_integer_triples"]


def integer_triples_graph(triples) -> ArcLabelledGraph:
    """Build an :class:`ArcLabelledGraph` from (source, target, label)
    triples.  Order is irrelevant; multiple arcs are not allowed; the node
    count is the max index + 1; labels are nonnegative ints saved as
    :class:`GammaCodedIntLabel` (key "FOO", matching the reference
    example's prototype)."""
    t = np.asarray(triples, dtype=np.int64).reshape(-1, 3)
    if len(t) == 0:
        return ArcLabelledGraph(CSRGraph.from_lists([]), [],
                                GammaCodedIntLabel("FOO"))
    if (t[:, 2] < 0).any():
        raise ValueError("labels must be nonnegative")
    order = np.lexsort((t[:, 1], t[:, 0]))
    t = t[order]
    dup = (np.diff(t[:, 0]) == 0) & (np.diff(t[:, 1]) == 0)
    if dup.any():
        raise ValueError("multiple arcs are not allowed")
    n = int(t[:, :2].max()) + 1
    g = CSRGraph.from_arcs(t[:, 0], t[:, 1], n, dedup=False)
    labels = [GammaCodedIntLabel("FOO", int(v)) for v in t[:, 2]]
    return ArcLabelledGraph(g, labels, GammaCodedIntLabel("FOO"))


def store_integer_triples(src: Union[str, IO[str]], basename: str) -> None:
    """The example's main(): read TAB-separated triples (one per line)
    and store the graph as BVGraph + BitStreamArcLabelledImmutableGraph
    under ``basename`` (underlying graph at ``basename-underlying``)."""
    close = False
    if isinstance(src, str):
        f = open(src)
        close = True
    else:
        f = src
    try:
        triples = [tuple(int(v) for v in line.split())
                   for line in f if line.strip()]
    finally:
        if close:
            f.close()
    labelled = integer_triples_graph(triples)
    from ..codecs.bvgraph import BVGraph
    BVGraph.store(labelled.graph, basename + "-underlying")
    BitStreamArcLabelledGraph.store(labelled, basename,
                                    underlying_basename=basename
                                    + "-underlying")
