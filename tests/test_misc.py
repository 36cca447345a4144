"""Tests for Stats, ScatteredArcs ingestion, incremental builder, typed graphs,
BuildHostMap (mirrors the corresponding reference test classes, SURVEY §4.6).
"""

import io

import numpy as np
import pytest

from webgraph_tpu import algo
from webgraph_tpu.codecs.scattered import (
    ScatteredArcsASCIIGraph,
    scattered_arcs_to_batches,
)
from webgraph_tpu.core.graph import CSRGraph
from webgraph_tpu.core.incremental import IncrementalGraphBuilder
from webgraph_tpu.typed import (
    BVTypedGraph,
    convert_to_typed,
    estimate_typed_graph_size,
    node,
    node_id,
    node_type,
)
from webgraph_tpu.utils.stats import compute_stats, write_stats

from .graphs import cycle_graph, erdos_renyi, star_graph


def test_scattered_numeric_remap():
    # ids in arbitrary order, remapped by appearance
    text = "100 300\n300 100\n200 100\n100 200\n"
    g = ScatteredArcsASCIIGraph(io.StringIO(text))
    # appearance order: 100, 300, 200 -> 0, 1, 2
    np.testing.assert_array_equal(g.ids, [100, 300, 200])
    csr = g.to_csr()
    assert set(csr.successors(0).tolist()) == {1, 2}
    assert set(csr.successors(1).tolist()) == {0}
    assert set(csr.successors(2).tolist()) == {0}
    g.batch_graph.cleanup()


def test_scattered_symmetrize_noloops():
    text = "5 5\n5 7\n"
    g = ScatteredArcsASCIIGraph(io.StringIO(text), symmetrize=True,
                                no_loops=True)
    csr = g.to_csr()
    assert csr.successors(0).tolist() == [1]
    assert csr.successors(1).tolist() == [0]
    g.batch_graph.cleanup()


def test_scattered_id_function():
    text = "a b\nb c\n"
    g = ScatteredArcsASCIIGraph(io.StringIO(text),
                                id_function=lambda s: ord(s))
    csr = g.to_csr()
    assert csr.num_nodes == 3
    assert csr.successors(0).tolist() == [1]
    g.batch_graph.cleanup()


def test_scattered_bulk(tmp_path):
    rng = np.random.default_rng(0)
    src = rng.integers(0, 1 << 40, 5000)
    tgt = rng.integers(0, 1 << 40, 5000)
    bg, ids = scattered_arcs_to_batches(src, tgt, batch_size=700,
                                        temp_dir=str(tmp_path))
    assert bg.num_nodes == len(ids)
    # arcs survive the remap
    idmap = {int(v): i for i, v in enumerate(ids)}
    expected = sorted({(idmap[int(s)], idmap[int(t)])
                       for s, t in zip(src, tgt)})
    got = []
    for x, succ in bg.iter_nodes():
        got.extend((x, int(t)) for t in succ)
    assert got == expected
    bg.cleanup()


def test_incremental_builder():
    b = IncrementalGraphBuilder()
    b.add([1, 2])
    b.add([])
    b.add([0])
    g = b.build()
    assert g.num_nodes == 3 and g.num_arcs == 3
    assert g.successors(0).tolist() == [1, 2]
    with pytest.raises(RuntimeError):
        b.add([1])
    b2 = IncrementalGraphBuilder()
    b2.add([1])
    g2 = b2.build(num_nodes=5)
    assert g2.num_nodes == 5 and g2.outdegree(4) == 0
    with pytest.raises(ValueError):
        IncrementalGraphBuilder().add([3, 1])


def test_stats(tmp_path):
    g = star_graph(6)
    s = compute_stats(g)
    assert s["nodes"] == 6 and s["arcs"] == 10
    assert s["maxoutdegree"] == 5 and s["maxindegree"] == 5
    assert s["dangling"] == 0
    g2 = CSRGraph.from_lists([np.asarray([0], dtype=np.int64),
                              np.zeros(0, dtype=np.int64)])
    s2 = compute_stats(g2)
    assert s2["loops"] == 1 and s2["dangling"] == 1
    write_stats(s, str(tmp_path / "g"))
    text = open(tmp_path / "g.stats").read()
    assert "arcs=10" in text
    dist = [int(l) for l in open(tmp_path / "g.outdegrees")]
    assert dist == np.bincount([5, 1, 1, 1, 1, 1]).tolist()


def test_typed_graph_roundtrip(tmp_path):
    g = erdos_renyi(40, 0.15, seed=0)
    types = (np.arange(40) % 3).astype(np.int64)
    base = str(tmp_path / "typed")
    convert_to_typed(g, types, base)
    tg = BVTypedGraph(base)
    assert tg.num_nodes == 40
    assert tg.num_arcs == g.num_arcs
    assert [tg.num_nodes_of_type(t) for t in range(3)] == [14, 13, 13]
    # successors of each node, mapped back, must equal the original
    local = np.zeros(40, dtype=np.int64)
    counts = np.zeros(3, dtype=np.int64)
    for x in range(40):
        local[x] = counts[types[x]]
        counts[types[x]] += 1
    for x in range(40):
        tx = node(int(types[x]), int(local[x]))
        got = sorted(tg.original_node(int(s)) for s in tg.successors(tx))
        assert got == sorted(g.successors(x).tolist())
    # packing helpers
    assert node_type(node(5, 99)) == 5 and node_id(node(5, 99)) == 99
    # type graph sanity: arcs between types that actually connect
    tgraph = tg.type_graph()
    assert tgraph.num_nodes == 3


def test_estimate_typed_size():
    g = erdos_renyi(30, 0.2, seed=1)
    types = (np.arange(30) % 2).astype(np.int64)
    est = estimate_typed_graph_size(g, types)
    assert est["total_bits"] > 0
    assert len(est["bits_per_type"]) == 2


def test_host_map(tmp_path):
    from webgraph_tpu.utils.hostmap import build_host_map, host_of, \
        write_host_map
    urls = ["http://example.com/a", "http://example.com/b",
            "https://other.org:8080/x", "http://user@example.com/c"]
    m, hosts = build_host_map(urls)
    assert hosts == ["example.com", "other.org"]
    assert m.tolist() == [0, 0, 1, 0]
    assert host_of("https://Foo.COM:443/bar") == "foo.com"
    write_host_map(str(tmp_path / "map"), str(tmp_path / "hosts"), m, hosts)
    back = np.fromfile(tmp_path / "map", dtype=">i8")
    assert back.tolist() == m.tolist()


def test_integer_list_graph(tmp_path):
    from webgraph_tpu.codecs.intlist import IntegerListImmutableGraph
    from webgraph_tpu.core import graph as core
    g = erdos_renyi(30, 0.15, seed=5)
    base = str(tmp_path / "il")
    IntegerListImmutableGraph.store(g, base)
    loaded = core.load(base)
    assert loaded.to_csr().equals(g)


def test_scattered_streaming_bounded(tmp_path):
    """Ingestion is memory-bounded: buffered pairs never exceed ~batch_size
    + one chunk, and the input streams through many small chunks
    (ScatteredArcsASCIIGraph.java:142-240 bounded-batch contract)."""
    rng = np.random.default_rng(1)
    n_arcs = 20000
    src = rng.integers(0, 1 << 32, n_arcs)
    tgt = rng.integers(0, 1 << 32, n_arcs)
    path = tmp_path / "arcs.txt"
    with open(path, "w") as f:
        for s, t in zip(src, tgt):
            f.write(f"{s} {t}\n")
    batch = 1000
    g = ScatteredArcsASCIIGraph(str(path), batch_size=batch,
                                temp_dir=str(tmp_path), chunk_bytes=4096)
    st = g.ingest_stats
    # one 4 KiB chunk holds < 400 pairs; buffer is bounded by batch + chunk
    assert st["max_buffered"] <= batch + 500, st
    assert st["num_batches"] >= n_arcs // batch - 1, st
    # equivalence vs the bulk path
    bg2, ids2 = scattered_arcs_to_batches(src, tgt, temp_dir=str(tmp_path))
    np.testing.assert_array_equal(g.ids, ids2)
    got = [(x, succ.tolist()) for x, succ in g.iter_nodes()]
    want = [(x, succ.tolist()) for x, succ in bg2.iter_nodes()]
    assert got == want
    g.batch_graph.cleanup()
    bg2.cleanup()


def test_scattered_native_parser_matches_python(tmp_path):
    from webgraph_tpu import native
    if not native.parse_arcs_available():
        pytest.skip("native lib not built")
    text = "# c\n10 20\n\n  30\t40 \n-5 6\n"
    s, t, used = native.parse_arcs(text.encode())
    assert s.tolist() == [10, 30, -5]
    assert t.tolist() == [20, 40, 6]
    assert used == len(text)
    # chunk protocol: incomplete tail is left unconsumed
    s, t, used = native.parse_arcs(b"1 2\n3 4", eof=False)
    assert s.tolist() == [1] and used == 4
