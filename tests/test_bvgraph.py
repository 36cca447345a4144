"""BVGraph codec tests.

Mirrors the reference's strategy (SURVEY §4): exhaustive small-parameter
sweeps against in-memory oracles, golden bit-stream compatibility against the
shipped cnr-2000 fixture, and property-file bit accounting checks
(BVGraphTest.java:52-122).
"""

import gzip
import hashlib
import os

import numpy as np
import pytest

from webgraph_tpu.codecs.ascii import ASCIIGraph
from webgraph_tpu.codecs.bvgraph import BVGraph, BVGraphSettings, CompressionFlags
from webgraph_tpu.core import graph as core
from webgraph_tpu.core.graph import CSRGraph

from .graphs import (
    complete_binary_intree,
    complete_binary_outtree,
    complete_graph,
    cycle_graph,
    erdos_renyi,
    star_graph,
)


def roundtrip(g: CSRGraph, tmp_path, **kwargs) -> BVGraph:
    base = str(tmp_path / "g")
    props = BVGraph.store(g, base, **kwargs)
    loaded = BVGraph.load(base)
    assert loaded.num_nodes == g.num_nodes
    assert loaded.num_arcs == g.num_arcs
    # sequential
    for (x, a), (y, b) in zip(loaded.iter_nodes(), g.iter_nodes()):
        assert x == y
        np.testing.assert_array_equal(a, b, err_msg=f"node {x}")
    # random access
    for x in range(g.num_nodes):
        np.testing.assert_array_equal(loaded.successors(x), g.successors(x))
    # bit accounting must sum exactly to the stream size (BVGraphTest.java:59-72)
    total = (int(props["bitsforoutdegrees"]) + int(props["bitsforreferences"])
             + int(props["bitsforblocks"]) + int(props["bitsforresiduals"])
             + int(props["bitsforintervals"]))
    stream_bits = os.path.getsize(base + ".graph") * 8
    assert total <= stream_bits < total + 8
    # arc partition: copied + intervalised + residual == m (BVGraphTest.java:77)
    assert (int(props["copiedarcs"]) + int(props["intervalisedarcs"])
            + int(props["residualarcs"])) == g.num_arcs
    return loaded


@pytest.mark.parametrize("window", [0, 1, 2, 3, 7])
@pytest.mark.parametrize("min_interval", [0, 2, 4])
def test_compression_sweep_complete_graph(tmp_path, window, min_interval):
    g = complete_graph(8)
    roundtrip(g, tmp_path, window_size=window, max_ref_count=3,
              min_interval_length=min_interval)


@pytest.mark.parametrize("gen,arg", [
    (complete_binary_intree, 4),
    (complete_binary_outtree, 4),
    (cycle_graph, 17),
    (star_graph, 13),
])
@pytest.mark.parametrize("window", [0, 2])
def test_compression_sweep_structured(tmp_path, gen, arg, window):
    g = gen(arg)
    roundtrip(g, tmp_path, window_size=window, max_ref_count=1,
              min_interval_length=2)


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("p", [0.05, 0.3])
def test_compression_erdos_renyi(tmp_path, seed, p):
    g = erdos_renyi(60, p, seed=seed)
    roundtrip(g, tmp_path)


def test_empty_and_singletons(tmp_path):
    roundtrip(CSRGraph.from_lists([np.zeros(0, dtype=np.int64)] * 5), tmp_path)
    roundtrip(CSRGraph.from_lists([]), tmp_path)


@pytest.mark.parametrize("residual_coding", [
    CompressionFlags.GAMMA, CompressionFlags.DELTA, CompressionFlags.ZETA,
    CompressionFlags.GOLOMB, CompressionFlags.NIBBLE,
])
def test_residual_codings(tmp_path, residual_coding):
    g = erdos_renyi(50, 0.15, seed=3)
    s = BVGraphSettings(residual_coding=residual_coding)
    loaded = roundtrip(g, tmp_path, settings=s)
    assert loaded.settings.residual_coding == residual_coding


@pytest.mark.parametrize("coding_attrs", [
    dict(outdegree_coding=CompressionFlags.DELTA),
    dict(reference_coding=CompressionFlags.GAMMA),
    dict(block_count_coding=CompressionFlags.UNARY),
    dict(block_coding=CompressionFlags.DELTA),
    dict(offset_coding=CompressionFlags.DELTA),
])
def test_component_codings(tmp_path, coding_attrs):
    g = erdos_renyi(40, 0.2, seed=9)
    s = BVGraphSettings(**coding_attrs)
    loaded = roundtrip(g, tmp_path, settings=s)
    # flags string roundtrip through the properties file
    assert loaded.settings.flags() == s.flags()


def test_flags_string_roundtrip():
    s = BVGraphSettings(residual_coding=CompressionFlags.GAMMA,
                        outdegree_coding=CompressionFlags.DELTA)
    rt = BVGraphSettings.from_flags_string(s.flags_string())
    assert rt.flags() == s.flags()
    assert BVGraphSettings.from_flags_string("").flags() == 0
    assert "RESIDUALS_GAMMA" in s.flags_string()


def test_iter_from_start(tmp_path):
    g = erdos_renyi(80, 0.1, seed=5)
    base = str(tmp_path / "g")
    BVGraph.store(g, base)
    loaded = BVGraph.load(base)
    for start in [0, 1, 7, 40, 79]:
        for (x, a), (y, b) in zip(loaded.iter_nodes(start), g.iter_nodes(start)):
            assert x == y
            np.testing.assert_array_equal(a, b)


def test_split_ranges():
    g = erdos_renyi(100, 0.05, seed=2)
    ranges = g.split_ranges(7)
    assert ranges[0][0] == 0 and ranges[-1][1] == 100
    assert all(a <= b for a, b in ranges)
    got = [x for lo, hi in ranges for x in range(lo, hi)]
    assert got == list(range(100))


def test_load_dispatch(tmp_path):
    g = erdos_renyi(30, 0.2, seed=11)
    base = str(tmp_path / "g")
    BVGraph.store(g, base)
    loaded = core.load(base)
    assert isinstance(loaded, BVGraph)
    assert loaded.equals(g)


def test_offsets_regeneration(tmp_path):
    g = erdos_renyi(50, 0.2, seed=13)
    base = str(tmp_path / "g")
    BVGraph.store(g, base)
    loaded = BVGraph.load(base)
    regen = loaded.decode_offsets_from_stream()
    np.testing.assert_array_equal(regen, loaded.offsets)


# ---------------------------------------------------------------------------
# Golden bit-stream compatibility: cnr-2000 (SURVEY §4.3)
# ---------------------------------------------------------------------------


def test_cnr2000_decode_prefix(cnr2000_basename):
    g = BVGraph.load(cnr2000_basename)
    assert (g.num_nodes, g.num_arcs) == (325557, 3216152)
    with gzip.open(cnr2000_basename + ".graph-txt.gz", "rt") as f:
        expected = ASCIIGraph.load_once(f)
        for (x, succ), (y, exp) in zip(g.iter_nodes(), expected):
            np.testing.assert_array_equal(succ, exp, err_msg=f"node {x}")
            if x >= 3000:
                break


def test_cnr2000_random_access(cnr2000_basename):
    g = BVGraph.load(cnr2000_basename)
    rng = np.random.default_rng(0)
    targets = sorted(rng.choice(g.num_nodes, 15, replace=False).tolist())
    expected = {}
    with gzip.open(cnr2000_basename + ".graph-txt.gz", "rt") as f:
        for x, succ in ASCIIGraph.load_once(f):
            if x in targets:
                expected[x] = succ
            if x > targets[-1]:
                break
    for x in targets:
        np.testing.assert_array_equal(g.successors(x), expected[x])


def test_cnr2000_reencode_prefix_bit_identical(cnr2000_basename, tmp_path):
    """Encoding a node-prefix with the file's own parameters must reproduce
    the reference bit stream *byte for byte* (prefix property: the encoder is
    strictly forward-dependent).  Full-file byte identity is verified in
    test_cnr2000_full (slow) and was established for the whole 1.4 MB file.
    """
    g = BVGraph.load(cnr2000_basename)
    N = 20000
    csr = g.to_csr(0, N)
    base = str(tmp_path / "re")
    BVGraph.store(csr, base, settings=BVGraphSettings(
        window_size=7, max_ref_count=3, min_interval_length=3, zeta_k=3))
    got = np.fromfile(base + ".graph", dtype=np.uint8)
    prefix_bits = int(g.offsets[N])
    ref = np.fromfile(cnr2000_basename + ".graph", dtype=np.uint8)
    nbytes = prefix_bits // 8
    np.testing.assert_array_equal(got[:nbytes], ref[:nbytes])


@pytest.mark.slow
def test_cnr2000_full_roundtrip_bit_identical(cnr2000_basename, tmp_path):
    g = BVGraph.load(cnr2000_basename)
    csr = g.to_csr()
    base = str(tmp_path / "full")
    # num_threads=1: the golden file is a SEQUENTIAL encode.  Parallel
    # compression resets the reference window at shard boundaries — in the
    # reference too (BVGraph.java:2373-2483) — so N-thread output is a
    # different (equally valid) bit stream; thread-count must not leak
    # machine dependence into the byte-identity oracle.
    props = BVGraph.store(csr, base, num_threads=1,
                          settings=BVGraphSettings(
                              window_size=7, max_ref_count=3,
                              min_interval_length=3, zeta_k=3))
    for ext in (".graph", ".offsets"):
        got = hashlib.md5(open(base + ext, "rb").read()).hexdigest()
        ref = hashlib.md5(open(cnr2000_basename + ext, "rb").read()).hexdigest()
        assert got == ref, f"{ext} differs"
    assert abs(float(props["bitsperlink"]) - 3.56) < 0.01


def test_foreign_obl_cache_ignored(tmp_path, cnr2000_basename):
    """A Java-serialized (or otherwise foreign) .obl must be ignored and the
    index regenerated from .offsets (PARITY.md deviation note; the reference
    trusts only its own serialization, BVGraph.java:1545-1555)."""
    import shutil

    for ext in (".graph", ".offsets", ".properties"):
        shutil.copy(cnr2000_basename + ext, str(tmp_path / ("g" + ext)))
    base = str(tmp_path / "g")
    want = BVGraph.load(base).offsets
    # Java serialization stream header AC ED 00 05 + junk
    with open(base + ".obl", "wb") as f:
        f.write(b"\xac\xed\x00\x05" + b"\x00" * 64)
    got = BVGraph.load(base)
    np.testing.assert_array_equal(np.asarray(got.offsets), np.asarray(want))
