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
from webgraph_tpu.core.graph import CSRGraph


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


# -- labelled offline transforms (MoreLabelledTransformTest patterns) ----------


def test_transpose_offline_labelled():
    from webgraph_tpu import transform as T
    g = make_labelled(erdos_renyi(50, 0.08, seed=3),
                      lambda v: GammaCodedIntLabel("W", v),
                      lambda x, t: (3 * x + t) % 100)
    bt = T.transpose_offline_labelled(g, batch_size=37)
    got = bt.to_arc_labelled()
    bt.cleanup()
    # oracle: in-memory transpose keeps each arc's label
    exp = {}
    for x, succ, labs in g.iter_labelled():
        for t, l in zip(succ.tolist(), labs):
            exp[(t, x)] = l.value
    seen = {}
    for y, succ, labs in got.iter_labelled():
        for t, l in zip(succ.tolist(), labs):
            seen[(y, t)] = l.value
    assert seen == exp
    # double transpose is the identity (labelled)
    bt2 = T.transpose_offline_labelled(got, batch_size=41)
    back = bt2.to_arc_labelled()
    bt2.cleanup()
    assert back.equals_labelled(g)


def test_symmetrize_offline_labelled_merge():
    from webgraph_tpu import transform as T
    # graph with some reciprocal arcs: labels of (x,y) and (y,x) merge
    lists = [[1, 2], [0], [3], []]
    g0 = CSRGraph.from_lists([np.asarray(l, dtype=np.int64) for l in lists])
    lab = make_labelled(g0, lambda v: GammaCodedIntLabel("W", v),
                        lambda x, t: 10 * x + t)
    bs = T.symmetrize_offline_labelled(
        lab, merge=lambda a, b: GammaCodedIntLabel("W", a.value + b.value),
        batch_size=3)
    got = bs.to_arc_labelled()
    bs.cleanup()
    vals = {}
    for x, succ, labs in got.iter_labelled():
        for t, l in zip(succ.tolist(), labs):
            vals[(x, t)] = l.value
    # (0,1) and (1,0) both exist in g0: labels 1 and 10 merge to 11
    assert vals[(0, 1)] == 11 and vals[(1, 0)] == 11
    # (0,2) exists only forward: symmetrized pair carries its label 2
    assert vals[(0, 2)] == 2 and vals[(2, 0)] == 2
    assert vals[(2, 3)] == 23 and vals[(3, 2)] == 23


def test_compose_labelled_semiring():
    from webgraph_tpu import transform as T
    from webgraph_tpu.labelling import LabelSemiring
    # path weights: multiply = add values, add = min (shortest-path semiring)
    g0 = make_labelled(CSRGraph.from_lists(
        [np.asarray(l, dtype=np.int64) for l in [[1, 2], [], [], []]]),
        lambda v: GammaCodedIntLabel("W", v), lambda x, t: t)  # 0->1 w1, 0->2 w2
    g1 = make_labelled(CSRGraph.from_lists(
        [np.asarray(l, dtype=np.int64) for l in [[], [3], [3], []]]),
        lambda v: GammaCodedIntLabel("W", v), lambda x, t: 5)  # 1->3, 2->3 w5
    sr = LabelSemiring(
        add=lambda a, b: GammaCodedIntLabel("W", min(a.value, b.value)),
        multiply=lambda a, b: GammaCodedIntLabel("W", a.value + b.value),
        zero=GammaCodedIntLabel("W", 1 << 30), one=GammaCodedIntLabel("W", 0))
    got = T.compose_labelled(g0, g1, sr)
    # two paths 0->1->3 (1+5=6) and 0->2->3 (2+5=7): min = 6
    np.testing.assert_array_equal(got.successors(0), [3])
    assert got.labels_of(0)[0].value == 6


def test_scc_labelled_filter():
    from webgraph_tpu import algo
    # a 3-cycle whose closing arc is label-filtered away -> singletons
    lists = [[1], [2], [0]]
    g0 = CSRGraph.from_lists([np.asarray(l, dtype=np.int64) for l in lists])
    lab = make_labelled(g0, lambda v: GammaCodedIntLabel("W", v),
                        lambda x, t: 1 if (x, t) == (2, 0) else 0)
    k_all, _ = algo.strongly_connected_components_labelled(
        lab, lambda l, x, t: True)
    k_cut, comp = algo.strongly_connected_components_labelled(
        lab, integer_label_filter(0))
    assert k_all == 1
    assert k_cut == 3 and len(np.unique(comp)) == 3


def test_fused_store_labelled_matches_two_pass(tmp_path):
    """BVGraph.store_labelled (one fused pass, BVGraph.java:1735-1853)
    writes byte-identical graph AND label files vs the separate-pass
    store."""
    g = erdos_renyi(80, 0.08, seed=5)
    lab = make_labelled(g, lambda v: GammaCodedIntLabel("TEST", v),
                        lambda x, t: (x * 3 + t) % 500)
    a = str(tmp_path / "two")
    BVGraph.store(g, a, backend="python")
    BitStreamArcLabelledGraph.store(lab, a + "-label", "two")
    b = str(tmp_path / "one")
    BVGraph.store_labelled(lab, b, b + "-label")
    for ea, eb in ((".graph", ".graph"), (".offsets", ".offsets")):
        assert open(a + ea, "rb").read() == open(b + eb, "rb").read(), ea
    for ext in (".labels", ".labeloffsets"):
        assert open(a + "-label" + ext, "rb").read() == \
            open(b + "-label" + ext, "rb").read(), ext
    loaded = BitStreamArcLabelledGraph.load(b + "-label")
    for x, succ, labs in loaded.iter_labelled():
        np.testing.assert_array_equal(succ, g.successors(x))
        for t, l in zip(succ.tolist(), labs):
            assert l.value == (x * 3 + t) % 500


def test_labelobl_cache(tmp_path):
    """.labelobl Elias-Fano cache round-trips and is preferred when
    fresh (the reference's mtime discipline on offset caches)."""
    import os

    g = erdos_renyi(50, 0.1, seed=2)
    lab = make_labelled(g, lambda v: GammaCodedIntLabel("T", v),
                        lambda x, t: x + t)
    base = str(tmp_path / "g")
    BVGraph.store(g, base)
    BitStreamArcLabelledGraph.store(lab, base + "-label", "g")
    first = BitStreamArcLabelledGraph.load(base + "-label")
    first.write_label_obl(base + "-label")
    assert os.path.exists(base + "-label.labelobl")
    again = BitStreamArcLabelledGraph.load(base + "-label")
    np.testing.assert_array_equal(first.label_offsets, again.label_offsets)
    for x, succ, labs in again.iter_labelled():
        for t, l in zip(succ.tolist(), labs):
            assert l.value == x + t


def test_integer_triples_graph(tmp_path):
    """The reference's worked example (examples/
    IntegerTriplesArcLabelledImmutableGraph.java): triples -> labelled
    graph -> BVGraph + BitStreamArcLabelledImmutableGraph roundtrip."""
    import io

    from webgraph_tpu.labelling import (integer_triples_graph,
                                        store_integer_triples)

    g = integer_triples_graph([(0, 2, 5), (2, 1, 0), (0, 1, 7)])
    assert g.num_nodes == 3 and g.num_arcs == 3
    assert g.successors(0).tolist() == [1, 2]
    assert [l.value for l in g.labels_of(0)] == [7, 5]
    with pytest.raises(ValueError):
        integer_triples_graph([(0, 1, 1), (0, 1, 2)])  # multiple arcs

    base = str(tmp_path / "tr")
    store_integer_triples(io.StringIO("0\t2\t5\n2\t1\t0\n0\t1\t7\n"), base)
    from webgraph_tpu.core import graph as core
    loaded = core.load(base)
    assert loaded.num_nodes == 3
    assert loaded.successors(0).tolist() == [1, 2]
    assert [l.value for l in loaded.labels_of(0)] == [7, 5]
