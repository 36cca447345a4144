"""Elias-Fano offsets index + .obl cache (BVGraph.java:1545-1558 analogue)."""

import os
import time

import numpy as np
import pytest

from webgraph_tpu.codecs.bvgraph import BVGraph
from webgraph_tpu.ops.ef_index import (EliasFanoMonotoneList, build_ef,
                                       device_select)

from .graphs import erdos_renyi


@pytest.mark.parametrize("n,u", [(1, 10), (100, 1000), (10_000, 10**7),
                                 (50_000, 3 * 10**9), (7, 7),
                                 (10_000, 10**12)])
def test_roundtrip(n, u):
    rng = np.random.default_rng(42)
    vals = np.sort(rng.integers(0, u, n)).astype(np.int64)
    ef = build_ef(vals)
    assert len(ef) == n
    assert np.array_equal(ef.to_array(), vals)
    idx = rng.integers(0, n, 333)
    assert np.array_equal(ef.get_batch(idx), vals[idx])
    assert ef[n // 2] == vals[n // 2]
    assert np.array_equal(ef[10:20], vals[10:20])
    # a packed index must actually be small
    if n >= 10_000:
        assert ef.nbytes < vals.nbytes / 2


@pytest.mark.parametrize("n,u", [(100, 1000), (50_000, 3 * 10**9),
                                 (10_000, 10**12)])
def test_device_select(n, u):
    rng = np.random.default_rng(7)
    vals = np.sort(rng.integers(0, u, n)).astype(np.int64)
    ef = build_ef(vals)
    lo32, up32, rk32 = ef.device_arrays()
    idx = rng.integers(0, n, 500).astype(np.int32)
    hi, lo = device_select(lo32, up32, rk32, ef.ell, idx)
    got = (np.asarray(hi).astype(np.int64) << ef.ell) | np.asarray(
        lo).astype(np.int64)
    assert np.array_equal(got, vals[idx])


def test_dump_load(tmp_path):
    rng = np.random.default_rng(3)
    vals = np.sort(rng.integers(0, 10**10, 5000)).astype(np.int64)
    p = str(tmp_path / "x.obl")
    build_ef(vals).dump(p)
    ef = EliasFanoMonotoneList.load(p)
    assert np.array_equal(ef.to_array(), vals)
    with open(p, "r+b") as f:
        f.write(b"JUNKJUNK")
    with pytest.raises(IOError):
        EliasFanoMonotoneList.load(p)


def test_obl_cache(tmp_path):
    g = erdos_renyi(300, 0.05, seed=5)
    base = str(tmp_path / "g")
    BVGraph.store(g, base)
    bv = BVGraph.load(base)
    path = bv.write_offsets_cache()
    assert path == base + ".obl" and os.path.exists(path)
    # fresh cache is used, both representations agree
    os.utime(path, (time.time() + 10, time.time() + 10))
    bv2 = BVGraph.load(base)
    assert np.array_equal(np.asarray(bv2.offsets), np.asarray(bv.offsets))
    bv3 = BVGraph.load(base, offsets="ef")
    assert isinstance(bv3.offsets, EliasFanoMonotoneList)
    assert np.array_equal(bv3.offsets.to_array(), np.asarray(bv.offsets))
    for x in (0, 7, 123, 299):
        np.testing.assert_array_equal(bv3.successors(x), g.successors(x))
    # stale cache (older than .offsets) is ignored
    os.utime(path, (1, 1))
    bv4 = BVGraph.load(base)
    assert np.array_equal(np.asarray(bv4.offsets), np.asarray(bv.offsets))
