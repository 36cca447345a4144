"""Arc-labelled graphs and the bit-stream label store.

Reference semantics: ArcLabelledImmutableGraph.java:40-77 (store contract,
UNDERLYINGGRAPH_PROPERTY_KEY), BitStreamArcLabelledImmutableGraph.java:66-120
(file family), :635-693 (store/saveProperties), UnionArcLabelledImmutableGraph
(LabelMergeStrategy), ArcRelabelledImmutableGraph:48, LabelSemiring:39,
IntegerLabelFilter:28.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Iterator, List, Optional, Tuple

import numpy as np

from ..core.graph import CSRGraph, ImmutableGraph, load as load_graph, \
    register_graph_class
from ..ops.bitio import BitReader, BitWriter
from ..utils import properties as javaprops
from .labels import Label, label_from_spec

__all__ = ["ArcLabelledGraph", "BitStreamArcLabelledGraph",
           "union_labelled", "relabel", "LabelSemiring",
           "integer_label_filter"]

LABELS_EXTENSION = ".labels"
LABEL_OFFSETS_EXTENSION = ".labeloffsets"
LABEL_OBL_EXTENSION = ".labelobl"
UNDERLYINGGRAPH_PROPERTY_KEY = "underlyinggraph"
LABELSPEC_PROPERTY_KEY = "labelspec"


def _decode_label_offsets(path: str, n: int) -> np.ndarray:
    """Gamma-gap label offsets (leading zero, n+1 entries,
    BitStreamArcLabelledImmutableGraph.java:66-120), native when built."""
    data = np.fromfile(path, dtype=np.uint8)
    from .. import native
    if native.available():
        from ..codecs.bvgraph import CompressionFlags as C
        return native.decode_offset_stream(data, n, C.GAMMA)
    r = BitReader(data)
    offsets = np.empty(n + 1, dtype=np.int64)
    acc = 0
    for i in range(n + 1):
        acc += r.read_gamma()
        offsets[i] = acc
    return offsets


class ArcLabelledGraph(ImmutableGraph):
    """In-memory labelled graph: a CSRGraph + one Label object per arc.

    ``labels`` is a list aligned with the CSR successor array: the label of
    the j-th arc of the whole graph is ``labels[j]``.  For single-integer
    labels, :meth:`label_values` exposes the dense int64 array (the
    device-friendly form).
    """

    def __init__(self, graph: CSRGraph, labels: List[Label],
                 prototype: Label):
        assert len(labels) == graph.num_arcs
        self.graph = graph
        self.labels = labels
        self.prototype = prototype
        self.properties = {}

    @property
    def num_nodes(self) -> int:
        return self.graph.num_nodes

    @property
    def num_arcs(self) -> int:
        return self.graph.num_arcs

    def outdegree(self, x: int) -> int:
        return self.graph.outdegree(x)

    def successors(self, x: int) -> np.ndarray:
        return self.graph.successors(x)

    def labels_of(self, x: int) -> List[Label]:
        lo, hi = self.graph.offsets[x], self.graph.offsets[x + 1]
        return self.labels[lo:hi]

    def iter_nodes(self, start: int = 0):
        return self.graph.iter_nodes(start)

    def iter_labelled(self, start: int = 0
                      ) -> Iterator[Tuple[int, np.ndarray, List[Label]]]:
        for x, succ in self.graph.iter_nodes(start):
            yield x, succ, self.labels_of(x)

    def label_values(self) -> np.ndarray:
        """Dense per-arc values for single-integer labels."""
        return np.asarray([l.value for l in self.labels], dtype=np.int64)

    def equals_labelled(self, other: "ArcLabelledGraph") -> bool:
        return (self.graph.equals(other.graph)
                and all(a == b for a, b in zip(self.labels, other.labels)))


@register_graph_class(
    "it.unimi.dsi.big.webgraph.labelling.BitStreamArcLabelledImmutableGraph",
    "it.unimi.dsi.webgraph.labelling.BitStreamArcLabelledImmutableGraph",
)
class BitStreamArcLabelledGraph(ImmutableGraph):
    """On-disk labelled graph: ``.labels`` bit stream + ``.labeloffsets``
    gamma-gap offsets over any underlying graph."""

    def __init__(self, underlying: ImmutableGraph, prototype: Label,
                 label_data: np.ndarray, label_offsets: np.ndarray,
                 properties: Optional[Dict[str, str]] = None):
        self.underlying = underlying
        self.prototype = prototype
        self.label_data = label_data
        self.label_offsets = label_offsets
        self.properties = properties or {}

    @property
    def num_nodes(self) -> int:
        return self.underlying.num_nodes

    @property
    def num_arcs(self) -> int:
        return self.underlying.num_arcs

    def successors(self, x: int) -> np.ndarray:
        return self.underlying.successors(x)

    def iter_nodes(self, start: int = 0):
        return self.underlying.iter_nodes(start)

    def labels_of(self, x: int) -> List[Label]:
        r = BitReader(self.label_data)
        r.position(int(self.label_offsets[x]))
        out = []
        for _ in range(self.underlying.outdegree(x)):
            lab = self.prototype.copy()
            lab.from_bitstream(r, x)
            out.append(lab)
        return out

    def iter_labelled(self, start: int = 0):
        for x, succ in self.iter_nodes(start):
            yield x, succ, self.labels_of(x)

    def to_arc_labelled(self) -> ArcLabelledGraph:
        csr = (self.underlying if isinstance(self.underlying, CSRGraph)
               else self.underlying.to_csr())
        labels: List[Label] = []
        for x, succ, labs in self.iter_labelled():
            labels.extend(labs)
        return ArcLabelledGraph(csr, labels, self.prototype)

    # -- persistence ------------------------------------------------------

    @classmethod
    def load(cls, basename: str, mode: str = "standard"
             ) -> "BitStreamArcLabelledGraph":
        props = javaprops.load(basename + ".properties")
        under_name = props[UNDERLYINGGRAPH_PROPERTY_KEY]
        if not os.path.isabs(under_name):
            under_name = os.path.join(os.path.dirname(basename), under_name)
        underlying = load_graph(under_name, mode=mode)
        prototype = label_from_spec(props[LABELSPEC_PROPERTY_KEY])
        data = np.fromfile(basename + LABELS_EXTENSION, dtype=np.uint8)
        n = underlying.num_nodes
        # .labelobl Elias-Fano cache when fresh (the reference's mtime
        # discipline, BVGraph.java:1545-1555 applied to .labelobl)
        obl = basename + LABEL_OBL_EXTENSION
        offs_path = basename + LABEL_OFFSETS_EXTENSION
        offsets = None
        if os.path.exists(obl) and (not os.path.exists(offs_path)
                                    or os.path.getmtime(obl)
                                    >= os.path.getmtime(offs_path)):
            from ..ops.ef_index import EliasFanoMonotoneList
            ef = EliasFanoMonotoneList.load(obl)
            if len(ef) == n + 1:
                offsets = ef.to_array()
        if offsets is None:
            offsets = _decode_label_offsets(offs_path, n)
        return cls(underlying, prototype, data, offsets, props)

    def write_label_obl(self, basename: str) -> None:
        """Write the ``.labelobl`` Elias-Fano label-offsets cache."""
        from ..ops.ef_index import build_ef
        build_ef(np.asarray(self.label_offsets, dtype=np.int64)).dump(
            basename + LABEL_OBL_EXTENSION)

    @classmethod
    def store(cls, labelled: ArcLabelledGraph, basename: str,
              underlying_basename: str,
              comment: str = "BitStreamArcLabelledImmutableGraph properties"
              ) -> Dict[str, str]:
        """Write .labels/.labeloffsets/.properties; the underlying graph is
        referenced by (relative) basename and must be stored separately
        (the reference's store contract, ArcLabelledImmutableGraph:40-58)."""
        w = BitWriter()
        offs = BitWriter()
        offs.write_gamma(0)
        last = 0
        for x, succ, labs in labelled.iter_labelled():
            for lab in labs:
                lab.to_bitstream(w, x)
            offs.write_gamma(w.written_bits - last)
            last = w.written_bits
        with open(basename + LABELS_EXTENSION, "wb") as f:
            f.write(w.to_bytes())
        with open(basename + LABEL_OFFSETS_EXTENSION, "wb") as f:
            f.write(offs.to_bytes())
        props = {
            "graphclass": ("it.unimi.dsi.big.webgraph.labelling."
                           "BitStreamArcLabelledImmutableGraph"),
            UNDERLYINGGRAPH_PROPERTY_KEY: underlying_basename,
            LABELSPEC_PROPERTY_KEY: labelled.prototype.to_spec(),
        }
        javaprops.dump(props, basename + ".properties", comment)
        return props


# ---------------------------------------------------------------------------
# labelled combinators
# ---------------------------------------------------------------------------


def union_labelled(g0: ArcLabelledGraph, g1: ArcLabelledGraph,
                   merge: Callable[[Label, Label], Label]
                   ) -> ArcLabelledGraph:
    """Labelled arc union; ``merge`` resolves arcs present in both
    (UnionArcLabelledImmutableGraph + LabelMergeStrategy.java:28)."""
    n = max(g0.num_nodes, g1.num_nodes)
    lists: List[np.ndarray] = []
    labels: List[Label] = []
    for x in range(n):
        pairs: Dict[int, Label] = {}
        if x < g0.num_nodes:
            for t, l in zip(g0.successors(x).tolist(), g0.labels_of(x)):
                pairs[t] = l
        if x < g1.num_nodes:
            for t, l in zip(g1.successors(x).tolist(), g1.labels_of(x)):
                pairs[t] = merge(pairs[t], l) if t in pairs else l
        keys = sorted(pairs)
        lists.append(np.asarray(keys, dtype=np.int64))
        labels.extend(pairs[k] for k in keys)
    return ArcLabelledGraph(CSRGraph.from_lists(lists), labels, g0.prototype)


def relabel(g: ArcLabelledGraph, convert: Callable[[Label, int, int], Label],
            prototype: Label) -> ArcLabelledGraph:
    """On-the-fly relabelling (ArcRelabelledImmutableGraph.java:48):
    ``convert(old_label, source, target) -> new_label``."""
    labels: List[Label] = []
    for x, succ, labs in g.iter_labelled():
        for t, l in zip(succ.tolist(), labs):
            labels.append(convert(l, x, t))
    return ArcLabelledGraph(g.graph, labels, prototype)


class LabelSemiring:
    """Semiring for labelled composition (LabelSemiring.java:39):
    ``multiply`` concatenates path labels, ``add`` merges alternative
    paths; ``zero``/``one`` are the identities."""

    def __init__(self, add, multiply, zero, one):
        self.add = add
        self.multiply = multiply
        self.zero = zero
        self.one = one


def integer_label_filter(*values) -> Callable:
    """Keep arcs whose integer label is among ``values``
    (IntegerLabelFilter.java:28)."""
    allowed = set(int(v) for v in values)

    def pred(label: Label, source: int, target: int) -> bool:
        return int(label.value) in allowed

    return pred


def filter_labelled(g: ArcLabelledGraph, pred) -> ArcLabelledGraph:
    """Materialized labelled arc filter (Transform.java labelled
    filterArcs :520-534)."""
    lists: List[np.ndarray] = []
    labels: List[Label] = []
    for x, succ, labs in g.iter_labelled():
        keep = [(t, l) for t, l in zip(succ.tolist(), labs) if pred(l, x, t)]
        lists.append(np.asarray([t for t, _ in keep], dtype=np.int64))
        labels.extend(l for _, l in keep)
    return ArcLabelledGraph(CSRGraph.from_lists(lists), labels, g.prototype)
