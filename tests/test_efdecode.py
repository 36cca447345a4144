"""Vectorized EF decoder vs the scalar oracle."""

import numpy as np
import pytest

from webgraph_tpu.codecs.efgraph import EFGraph
from webgraph_tpu.ops.efdecode import ef_decode_to_csr

from .graphs import complete_graph, cycle_graph, erdos_renyi, star_graph


def ef_check(g, tmp_path, **kw):
    base = str(tmp_path / "ef")
    EFGraph.store(g, base, **kw)
    ef = EFGraph.load(base)
    co, succ = ef_decode_to_csr(ef.words, ef.offsets, ef.upper_bound,
                                ef.log2_quantum)
    exp = g.to_csr()
    np.testing.assert_array_equal(co, exp.offsets)
    np.testing.assert_array_equal(succ, exp.succ)


@pytest.mark.parametrize("seed,p", [(0, 0.1), (1, 0.02), (2, 0.3)])
def test_efdecode_er(tmp_path, seed, p):
    ef_check(erdos_renyi(150, p, seed=seed), tmp_path)


@pytest.mark.parametrize("gen", [lambda: complete_graph(12),
                                 lambda: cycle_graph(40),
                                 lambda: star_graph(17)])
def test_efdecode_structured(tmp_path, gen):
    ef_check(gen(), tmp_path)


def test_efdecode_upper_bound(tmp_path):
    ef_check(erdos_renyi(60, 0.1, seed=3), tmp_path, upper_bound=5000)


@pytest.mark.parametrize("q", [0, 2, 8])
def test_efdecode_quantum(tmp_path, q):
    ef_check(erdos_renyi(100, 0.15, seed=4), tmp_path, log2_quantum=q)


def test_efdecode_empty_lists(tmp_path):
    from webgraph_tpu.core.graph import CSRGraph
    g = CSRGraph.from_lists([np.zeros(0, dtype=np.int64),
                             np.asarray([0, 2], dtype=np.int64),
                             np.zeros(0, dtype=np.int64)])
    ef_check(g, tmp_path)
