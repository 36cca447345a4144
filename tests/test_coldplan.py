"""Cold-plan tests: kernel decode planned from .graph/.offsets ALONE.

The reference's load contract needs only the artifact files
(BVGraph.java:1479-1574 loadInternal; decode :995-1097).  The cold plan
mirrors it: per-node references come from a native header-only scan
(wg_bv_scan_refs), halo lists are resolved by wavefront passes of the
kernel itself (resolve_halos — chains are <= max_ref_count hops,
BVGraph.java:455), and hub merge positions come from a device argsort at
the fixpoint (finalize_hub).  No host oracle decode anywhere.
"""

import numpy as np
import pytest

from webgraph_tpu import native
from webgraph_tpu.codecs.bvgraph import BVGraph, BVGraphSettings
from webgraph_tpu.ops import kdecode as K

from .graphs import erdos_renyi


def _cold_roundtrip(g, tmp_path, plan_kwargs=None, **store_kwargs):
    base = str(tmp_path / "cold")
    BVGraph.store(g, base, backend="python", **store_kwargs)
    bv = BVGraph.load(base)
    data = np.asarray(bv.data)
    outd = native.decode_outdegrees(data, bv.offsets,
                                    bv.settings.outdegree_coding)
    prep = K.plan_kernel_decode(bv.offsets, outd, bv.settings, data,
                                **(plan_kwargs or {}))
    assert prep is not None
    assert prep.cold
    passes = K.resolve_halos(prep)
    out, diag, hv = K.decode_full(prep)
    errs = K.check_diag(prep, diag)
    co, succ = K.chunked_to_csr(prep, out, data=data, settings=bv.settings,
                                errs=errs, hub_vals=hv)
    exp = g.to_csr()
    np.testing.assert_array_equal(co, exp.offsets)
    np.testing.assert_array_equal(succ, exp.succ)
    return prep, passes


def test_scan_refs_matches_oracle(cnr2000_basename):
    """Header-only ref scan == the full decoder's recorded references on
    the golden fixture."""
    bv = BVGraph.load(cnr2000_basename)
    data = np.asarray(bv.data)
    _, _, refs_oracle = native.bv_decode_all_refs(
        data, bv.num_nodes, bv.num_arcs, bv.settings)
    refs = native.bv_scan_refs(data, bv.offsets, bv.settings)
    np.testing.assert_array_equal(refs, refs_oracle)


def test_cold_plan_wavefront(tmp_path):
    g = erdos_renyi(300, 0.05, seed=5)
    prep, passes = _cold_roundtrip(g, tmp_path)
    # chains exist, so at least one extraction pass ran and converged
    assert 1 <= passes <= 4
    assert prep.resolved


def test_cold_plan_windowless(tmp_path):
    g = erdos_renyi(200, 0.05, seed=6)
    prep, passes = _cold_roundtrip(g, tmp_path, window_size=0)
    assert passes == 0  # no halos, nothing to resolve


def test_cold_plan_hub_finalize(tmp_path):
    """Hub merge positions derived on device (argsort at the fixpoint) —
    no host list decode."""
    rng = np.random.default_rng(3)
    lists = []
    n = 500
    for x in range(n):
        if x % 101 == 0:
            base = max(0, x - 120)
            runs = np.arange(base, min(base + 240, n - 1), dtype=np.int64)
            extra = rng.choice(n - 1, size=15, replace=False)
            lists.append(np.unique(np.concatenate([runs, extra])))
        elif x % 101 == 1 and x > 1:
            lists.append(lists[-1][1:-1].copy())  # follower copies the hub
        else:
            k = int(rng.integers(0, 5))
            lists.append(np.sort(rng.choice(n - 1, size=k, replace=False))
                         .astype(np.int64))
    from webgraph_tpu.core.graph import CSRGraph
    g = CSRGraph.from_lists(lists)
    prep, _ = _cold_roundtrip(
        g, tmp_path,
        plan_kwargs=dict(target_arcs_per_lane=32, v_cap=64, r_cap=48))
    assert prep.hub is not None and len(prep.hub.nodes) > 0
    assert prep.hub.finalized


def test_cold_plan_host_static_pred(tmp_path):
    """A predecessor in a lane skipped by BIT size (not arcs) is
    host-decoded at plan time (_host_pred_values), since its list cannot
    come from the store."""
    rng = np.random.default_rng(7)
    lists = []
    n = 300
    for x in range(n):
        if x == 100:
            # residual-heavy, no intervals: many words, modest outdegree —
            # skipped by BIT size while still fitting another lane's halo
            lists.append(np.sort(rng.choice(
                np.arange(0, n - 1, 4), size=60, replace=False))
                .astype(np.int64))
        elif x == 101:
            lists.append(lists[-1][:-2].copy())  # references node 100
        else:
            lists.append(np.asarray([(x * 3 + 1) % n], dtype=np.int64))
    from webgraph_tpu.core.graph import CSRGraph
    g = CSRGraph.from_lists(lists)
    prep, _ = _cold_roundtrip(
        g, tmp_path, min_interval_length=0,
        plan_kwargs=dict(target_arcs_per_lane=8, v_cap=128, r_cap=10,
                         hub_device=False))
    assert prep.skipped.any()
    # node 100 is skipped (bit size) yet node 101's active chunk copies
    # from it — its list was host-decoded into the static init image
    c101 = np.searchsorted(prep.chunk_starts, 101, side="right") - 1
    assert not prep.skipped[c101]


def test_cold_plan_delta_zeta(tmp_path):
    from webgraph_tpu.codecs.bvgraph import CompressionFlags as C

    g = erdos_renyi(180, 0.07, seed=11)
    s = BVGraphSettings(outdegree_coding=C.DELTA, window_size=4,
                        min_interval_length=2)
    _cold_roundtrip(g, tmp_path, settings=s)
