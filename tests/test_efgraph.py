"""EFGraph codec tests (mirrors EFGraphTest incl. skipTo, SURVEY §4.6)."""

import numpy as np
import pytest

from webgraph_tpu.codecs.efgraph import (
    EFGraph,
    lower_bits,
    number_of_pointers,
    pointer_size,
)
from webgraph_tpu.core import graph as core
from webgraph_tpu.ops.longword import LongWordReader, LongWordWriter

from .graphs import complete_graph, cycle_graph, erdos_renyi, star_graph


def test_longword_roundtrip():
    import random
    rng = random.Random(0)
    w = LongWordWriter()
    ops = []
    for _ in range(3000):
        kind = rng.randrange(3)
        if kind == 0:
            v, width = rng.getrandbits(rng.randrange(1, 64)), None
            width = max(v.bit_length(), 1)
            w.append(v, width)
            ops.append(("bits", v, width))
        elif kind == 1:
            v = rng.randrange(0, 300)
            w.write_unary(v)
            ops.append(("unary", v, None))
        else:
            v = rng.randrange(0, 1 << 40)
            w.write_gamma(v)
            ops.append(("gamma", v, None))
    r = LongWordReader(w.to_words())
    r.position(0)
    for kind, v, width in ops:
        if kind == "bits":
            assert r.extract(width) == v
        elif kind == "unary":
            assert r.read_unary() == v
        else:
            assert r.read_gamma() == v


def test_longword_position():
    w = LongWordWriter()
    positions = []
    for x in range(200):
        positions.append(w.written_bits)
        w.write_gamma(x)
    r = LongWordReader(w.to_words())
    for x in [0, 199, 63, 64, 65, 127, 128, 17]:
        r.position(positions[x])
        assert r.read_gamma() == x


def test_ef_params():
    # floor(log2(u/len)); sentinel-corrected lengths are the caller's job
    assert lower_bits(1, 1) == 0
    assert lower_bits(4, 1024) == 8
    assert lower_bits(5, 4) == 0
    assert number_of_pointers(4, 1024, 2) == 1
    assert pointer_size(4, 1024) == 3


def roundtrip(g, tmp_path, **kw):
    base = str(tmp_path / "ef")
    props = EFGraph.store(g, base, **kw)
    loaded = EFGraph.load(base)
    assert loaded.num_nodes == g.num_nodes
    assert loaded.num_arcs == g.num_arcs
    for x in range(g.num_nodes):
        np.testing.assert_array_equal(loaded.successors(x), g.successors(x),
                                      err_msg=f"node {x}")
    # sequential (offset-free) scan
    seq = EFGraph.load(base, mode="offline")
    for (x, a), (y, b) in zip(seq.iter_nodes(), g.iter_nodes()):
        assert x == y
        np.testing.assert_array_equal(a, b)
    return loaded


@pytest.mark.parametrize("gen,arg", [
    (lambda: erdos_renyi(80, 0.1, seed=0), None),
    (lambda: erdos_renyi(200, 0.02, seed=1), None),
    (lambda: complete_graph(12), None),
    (lambda: cycle_graph(33), None),
    (lambda: star_graph(19), None),
])
def test_ef_roundtrip(tmp_path, gen, arg):
    roundtrip(gen(), tmp_path)


@pytest.mark.parametrize("log2q", [0, 1, 2, 4, 8])
def test_ef_quantum_sweep(tmp_path, log2q):
    g = erdos_renyi(150, 0.15, seed=3)
    roundtrip(g, tmp_path, log2_quantum=log2q)


def test_ef_upper_bound(tmp_path):
    g = erdos_renyi(60, 0.1, seed=5)
    loaded = roundtrip(g, tmp_path, upper_bound=1000)
    assert loaded.upper_bound == 1000


def test_ef_skip_to(tmp_path):
    g = erdos_renyi(120, 0.2, seed=7)
    base = str(tmp_path / "ef")
    EFGraph.store(g, base, log2_quantum=2)  # tiny quantum exercises pointers
    loaded = EFGraph.load(base)
    rng = np.random.default_rng(0)
    for x in range(0, 120, 7):
        succ = g.successors(x)
        for bound in [0, 1, 30, 60, 90, 119, 120, 500]:
            got = loaded.successors_from(x, bound)
            exp = succ[succ >= bound]
            np.testing.assert_array_equal(got, exp,
                                          err_msg=f"node {x} bound {bound}")


def test_ef_empty_lists(tmp_path):
    from webgraph_tpu.core.graph import CSRGraph
    g = CSRGraph.from_lists([np.zeros(0, dtype=np.int64),
                             np.asarray([0, 2], dtype=np.int64),
                             np.zeros(0, dtype=np.int64)])
    roundtrip(g, tmp_path)


def test_ef_load_dispatch(tmp_path):
    g = erdos_renyi(40, 0.1, seed=9)
    base = str(tmp_path / "ef")
    EFGraph.store(g, base)
    loaded = core.load(base)
    assert isinstance(loaded, EFGraph)
    assert loaded.equals(g)


def test_ef_byte_order(tmp_path):
    g = erdos_renyi(50, 0.1, seed=11)
    base = str(tmp_path / "be")
    EFGraph.store(g, base, byte_order="big")
    loaded = EFGraph.load(base)
    assert loaded.equals(g)
