"""Labelled-graph tests (mirrors BitStreamArcLabelledGraphTest, SURVEY §4.7)."""

import numpy as np
import pytest

from webgraph_tpu.codecs.bvgraph import BVGraph
from webgraph_tpu.core import graph as core
from webgraph_tpu.labelling import (
    ArcLabelledGraph,
    BitStreamArcLabelledGraph,
    FixedWidthIntLabel,
    FixedWidthIntListLabel,
    FixedWidthLongListLabel,
    GammaCodedIntLabel,
    label_from_spec,
    relabel,
    union_labelled,
)
from webgraph_tpu.labelling.graph import filter_labelled, integer_label_filter

from .graphs import cycle_graph, erdos_renyi


def make_labelled(g, proto_factory, value_fn):
    labels = []
    for x, succ in g.iter_nodes():
        for t in succ.tolist():
            labels.append(proto_factory(value_fn(x, t)))
    return ArcLabelledGraph(g.to_csr(), labels,
                            proto_factory(0))


@pytest.mark.parametrize("proto,width", [
    (lambda v: FixedWidthIntLabel("TEST", 10, v), 10),
    (lambda v: GammaCodedIntLabel("TEST", v), None),
])
def test_bitstream_roundtrip(tmp_path, proto, width):
    g = erdos_renyi(60, 0.1, seed=0)
    lab = make_labelled(g, proto, lambda x, t: (x * 7 + t) % 1000)
    base = str(tmp_path / "g")
    BVGraph.store(g, base)
    BitStreamArcLabelledGraph.store(lab, base + "-label", "g")
    loaded = BitStreamArcLabelledGraph.load(str(tmp_path / "g-label"))
    assert loaded.num_nodes == g.num_nodes
    for x, succ, labs in loaded.iter_labelled():
        np.testing.assert_array_equal(succ, g.successors(x))
        for t, l in zip(succ.tolist(), labs):
            assert l.value == (x * 7 + t) % 1000
    # generic dispatch through core.load
    via_core = core.load(str(tmp_path / "g-label"))
    assert isinstance(via_core, BitStreamArcLabelledGraph)


def test_list_labels_roundtrip(tmp_path):
    g = cycle_graph(10)
    labels = []
    for x, succ in g.iter_nodes():
        for t in succ.tolist():
            labels.append(FixedWidthIntListLabel("L", 12, [x, t, x + t]))
    lab = ArcLabelledGraph(g.to_csr(), labels, FixedWidthIntListLabel("L", 12))
    base = str(tmp_path / "g")
    BVGraph.store(g, base)
    BitStreamArcLabelledGraph.store(lab, base + "-label", "g")
    loaded = BitStreamArcLabelledGraph.load(base + "-label")
    for x, succ, labs in loaded.iter_labelled():
        for t, l in zip(succ.tolist(), labs):
            np.testing.assert_array_equal(l.value, [x, t, x + t])


def test_label_spec_roundtrip():
    l = FixedWidthIntLabel("FOO", 10)
    l2 = label_from_spec(l.to_spec())
    assert isinstance(l2, FixedWidthIntLabel)
    assert l2.width == 10 and l2.key == "FOO"
    g = label_from_spec(
        "it.unimi.dsi.big.webgraph.labelling.GammaCodedIntLabel(BAR)")
    assert isinstance(g, GammaCodedIntLabel)
    with pytest.raises(IOError):
        label_from_spec("com.example.Nope(X)")


def test_union_labelled():
    g0 = make_labelled(cycle_graph(6), lambda v: GammaCodedIntLabel("W", v),
                       lambda x, t: 1)
    g1 = make_labelled(cycle_graph(6), lambda v: GammaCodedIntLabel("W", v),
                       lambda x, t: 2)
    u = union_labelled(g0, g1,
                       lambda a, b: GammaCodedIntLabel("W", a.value + b.value))
    for x, succ, labs in u.iter_labelled():
        assert all(l.value == 3 for l in labs)


def test_relabel_and_filter():
    g = make_labelled(erdos_renyi(40, 0.1, seed=1),
                      lambda v: GammaCodedIntLabel("W", v),
                      lambda x, t: (x + t) % 4)
    doubled = relabel(g, lambda l, x, t: GammaCodedIntLabel("W", 2 * l.value),
                      GammaCodedIntLabel("W"))
    assert doubled.label_values().tolist() == (2 * g.label_values()).tolist()
    kept = filter_labelled(g, integer_label_filter(0, 1))
    for x, succ, labs in kept.iter_labelled():
        assert all(l.value in (0, 1) for l in labs)
    # arcs kept = arcs whose label is 0 or 1
    assert kept.num_arcs == int(np.isin(g.label_values(), [0, 1]).sum())


def test_fixed_width_detection():
    assert FixedWidthIntLabel("A", 7).fixed_width() == 7
    assert GammaCodedIntLabel("A").fixed_width() == -1
    assert FixedWidthLongListLabel("A", 33).fixed_width() == -1
