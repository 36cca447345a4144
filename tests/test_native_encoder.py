"""Native (C++) multithreaded encoder tests.

The native path must be byte-identical to the Python reference encoder for
threads=1 (single stream), and decode-equal with matching stats for
multithreaded encodes (the reference's per-thread window resets + bit-exact
concatenation, BVGraph.java:2373-2483).
"""

import hashlib
import os

import numpy as np
import pytest

import webgraph_tpu.utils.properties as javaprops
from webgraph_tpu import native
from webgraph_tpu.codecs.bvgraph import BVGraph, BVGraphSettings

from .graphs import complete_graph, cycle_graph, erdos_renyi, star_graph

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libwgnative.so not built")


def _store_pair(g, tmp_path, threads, **kwargs):
    a = str(tmp_path / "py")
    b = str(tmp_path / "nat")
    pa = BVGraph.store(g, a, backend="python", **kwargs)
    pb = BVGraph.store(g, b, backend="native", num_threads=threads, **kwargs)
    return a, b, pa, pb


@pytest.mark.parametrize("window,minint", [(0, 0), (0, 4), (2, 2), (7, 4)])
def test_byte_identity_vs_python(tmp_path, window, minint):
    g = erdos_renyi(200, 0.04, seed=7)
    a, b, pa, pb = _store_pair(g, tmp_path, threads=1,
                               window_size=window, max_ref_count=3,
                               min_interval_length=minint)
    for ext in (".graph", ".offsets"):
        assert open(a + ext, "rb").read() == open(b + ext, "rb").read(), ext
    assert pa == pb  # the full properties/metrics surface must agree


@pytest.mark.parametrize("coding", ["DELTA", "GAMMA", "NIBBLE", "GOLOMB"])
def test_byte_identity_residual_codings(tmp_path, coding):
    from webgraph_tpu.codecs.bvgraph import CompressionFlags as C

    g = erdos_renyi(120, 0.06, seed=11)
    s = BVGraphSettings(residual_coding=getattr(C, coding),
                        window_size=3, min_interval_length=2)
    a, b, pa, pb = _store_pair(g, tmp_path, threads=1, settings=s)
    assert open(a + ".graph", "rb").read() == open(b + ".graph", "rb").read()
    assert pa == pb


@pytest.mark.parametrize("gfn", [lambda: complete_graph(12),
                                 lambda: star_graph(64),
                                 lambda: cycle_graph(100),
                                 lambda: erdos_renyi(400, 0.03, seed=1)])
def test_multithread_roundtrip(tmp_path, gfn):
    g = gfn()
    base = str(tmp_path / "mt")
    props = BVGraph.store(g, base, backend="native", num_threads=5)
    loaded = BVGraph.load(base)
    for x in range(g.num_nodes):
        np.testing.assert_array_equal(loaded.successors(x), g.successors(x))
    assert (int(props["copiedarcs"]) + int(props["intervalisedarcs"])
            + int(props["residualarcs"])) == g.num_arcs


def test_cnr2000_native_byte_identity(tmp_path, cnr2000_basename):
    """Native re-encode of cnr-2000 reproduces the Java-written stream
    byte for byte (the golden compatibility surface)."""
    bv = BVGraph.load(cnr2000_basename)
    csr_off, succ = native.bv_decode_all(
        np.asarray(bv.data), bv.num_nodes, bv.num_arcs, bv.settings)
    s = BVGraphSettings(window_size=7, max_ref_count=3,
                        min_interval_length=3, zeta_k=3)
    from webgraph_tpu.core.graph import CSRGraph

    out = str(tmp_path / "cnr")
    BVGraph.store(CSRGraph(csr_off, succ), out, settings=s,
                  backend="native", num_threads=1)
    want = {
        ".graph": "d56e5ef76121bd184c68ecb0262f5983",
        ".offsets": "afd663cc6560c9784f3b63a4b665de12",
    }
    for ext, md5 in want.items():
        got = hashlib.md5(open(out + ext, "rb").read()).hexdigest()
        assert got == md5, ext


def test_cnr2000_multithread_decode_equal(tmp_path, cnr2000_basename):
    """8-thread encode differs in bits (window resets) but decodes equal."""
    bv = BVGraph.load(cnr2000_basename)
    csr_off, succ = native.bv_decode_all(
        np.asarray(bv.data), bv.num_nodes, bv.num_arcs, bv.settings)
    s = BVGraphSettings(window_size=7, max_ref_count=3,
                        min_interval_length=3, zeta_k=3)
    from webgraph_tpu.core.graph import CSRGraph

    out = str(tmp_path / "cnr8")
    props = BVGraph.store(CSRGraph(csr_off, succ), out, settings=s,
                          backend="native", num_threads=8)
    g2 = BVGraph.load(out)
    co2, su2 = native.bv_decode_all(
        np.asarray(g2.data), g2.num_nodes, g2.num_arcs, g2.settings)
    np.testing.assert_array_equal(co2, csr_off)
    np.testing.assert_array_equal(su2, succ)
    # compressed size stays within 0.1% of the single-stream reference size
    assert int(props["bitsforoutdegrees"]) > 0
    golden_bits = 11443904
    bits = os.path.getsize(out + ".graph") * 8
    assert bits < golden_bits * 1.001
