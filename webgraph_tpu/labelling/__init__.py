"""Labelled graphs (SURVEY §2.3).

From-scratch implementation of the reference's labelling package: arc labels
serialized into a separate bit stream next to any underlying graph.

- :class:`Label` hierarchy — self-delimiting bit-stream serialization given
  the source node, fixed-width detection, ObjectParser-style spec strings
  (Label.java:45-62, :264).
- :class:`ArcLabelledGraph` — in-memory labelled graph: CSR + a per-arc
  label-value array (array-first: the common integer labels live in one
  int64 array aligned with the successor array, ready for device upload).
- :class:`BitStreamArcLabelledGraph` — the ``.labels`` +
  ``.labeloffsets`` + ``.properties`` on-disk family wrapping an underlying
  ImmutableGraph (BitStreamArcLabelledImmutableGraph.java:66-120 format:
  per node, the labels of its arcs in successor order; offsets are a
  gamma-coded gap stream with leading zero and n+1 entries).
- union / relabelling / semiring composition / label filters
  (UnionArcLabelledImmutableGraph, ArcRelabelledImmutableGraph,
  LabelSemiring, IntegerLabelFilter).
"""

from .labels import (
    FixedWidthIntLabel,
    FixedWidthIntListLabel,
    FixedWidthLongListLabel,
    GammaCodedIntLabel,
    Label,
    label_from_spec,
)
from .graph import (
    ArcLabelledGraph,
    BitStreamArcLabelledGraph,
    LabelSemiring,
    integer_label_filter,
    relabel,
    union_labelled,
)
from .triples import integer_triples_graph, store_integer_triples

__all__ = [
    "Label", "FixedWidthIntLabel", "FixedWidthIntListLabel",
    "FixedWidthLongListLabel", "GammaCodedIntLabel", "label_from_spec",
    "ArcLabelledGraph", "BitStreamArcLabelledGraph", "union_labelled",
    "relabel", "LabelSemiring", "integer_label_filter",
    "integer_triples_graph", "store_integer_triples",
]
