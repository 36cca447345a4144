"""Ragged-compaction kernel tests (interpret mode, CPU backend).

Property-checks plan_compact + compact against the reference formulation
(the plain gather) on random ragged lane layouts, including invalid runs
(spliced regions), fallback blocks, and tiny/empty lanes.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from webgraph_tpu.ops import kcompact as KC  # noqa: E402


def _random_layout(rng, R, V, max_arcs):
    arcs = rng.integers(0, max_arcs, size=R)
    halo = rng.integers(0, V - max_arcs, size=R)
    halo = np.minimum(halo, V - arcs - 1)
    arc_start = np.zeros(R + 1, dtype=np.int64)
    np.cumsum(arcs, out=arc_start[1:])
    src0 = np.arange(R, dtype=np.int64) * V + halo
    m = int(arc_start[-1])
    lm = rng.integers(0, 1 << 30, size=R * V).astype(np.int32)
    exp = np.empty(m, dtype=np.int32)
    for i in range(R):
        a, b = arc_start[i], arc_start[i + 1]
        exp[a:b] = lm[src0[i]:src0[i] + (b - a)]
    return arc_start, src0, m, lm, exp


@pytest.mark.parametrize("seed,R,V,ma", [(0, 40, 64, 40), (1, 300, 96, 90),
                                         (2, 7, 512, 500), (3, 128, 32, 2)])
def test_compact_matches_gather(seed, R, V, ma):
    rng = np.random.default_rng(seed)
    arc_start, src0, m, lm, exp = _random_layout(rng, R, V, ma)
    if m == 0:
        return
    valid = np.ones(R, dtype=bool)
    cp = KC.plan_compact(arc_start, src0, valid, m, store_elems=R * V)
    assert cp is not None
    got = np.asarray(KC.compact(cp, jnp.asarray(lm), m, interpret=True))
    if cp.fb_dst is not None:
        fb = np.asarray(cp.fb_dst)
        keep = np.ones(m, dtype=bool)
        keep[fb] = False
        np.testing.assert_array_equal(got[keep], exp[keep])
    else:
        np.testing.assert_array_equal(got, exp)


def test_compact_invalid_runs_spliced():
    rng = np.random.default_rng(5)
    arc_start, src0, m, lm, exp = _random_layout(rng, 60, 64, 50)
    valid = rng.random(60) > 0.3
    cp = KC.plan_compact(arc_start, src0, valid, m, store_elems=60 * 64)
    got = np.asarray(KC.compact(cp, jnp.asarray(lm), m, interpret=True))
    # valid-run positions must match; invalid positions are caller-spliced
    vmask = np.zeros(m, dtype=bool)
    for i in np.flatnonzero(valid):
        vmask[arc_start[i]:arc_start[i + 1]] = True
    if cp.fb_dst is not None:
        vmask[np.asarray(cp.fb_dst)] = False
    np.testing.assert_array_equal(got[vmask], exp[vmask])


def test_compact_long_single_run():
    """One run spanning many output blocks (entry splitting)."""
    V = 8192 + 128
    arcs = np.asarray([8192], dtype=np.int64)
    arc_start = np.asarray([0, 8192], dtype=np.int64)
    src0 = np.asarray([64], dtype=np.int64)
    lm = np.arange(V, dtype=np.int32)
    cp = KC.plan_compact(arc_start, src0, np.ones(1, bool), 8192,
                         store_elems=V)
    got = np.asarray(KC.compact(cp, jnp.asarray(lm), 8192, interpret=True))
    np.testing.assert_array_equal(got, np.arange(64, 64 + 8192))


def test_compact_hub_runs_two_windows():
    """Hub runs merged into the tables: some chunk runs are invalid (hub
    gaps) and hub runs tile them with sources in a FAR region of the store
    (the preset-lane analogue), forcing the second DMA window.  Sources
    past the store (static interval values) stay invalid."""
    rng = np.random.default_rng(7)
    R, V = 96, 1024
    arc_start, src0, m, lm, exp = _random_layout(rng, R, V, 700)
    if m == 0:
        return
    valid = np.ones(R, dtype=bool)
    # mark every 5th run as a hub gap; tile each gap with short hub runs
    # sourced from the store tail region (emulating preset lanes)
    store = R * V
    far0 = store - 9000
    hd, hs = [], []
    exp2 = exp.copy()
    nxt = far0
    for i in range(0, R, 5):
        valid[i] = False
        a, b = int(arc_start[i]), int(arc_start[i + 1])
        p = a
        while p < b:
            ln = min(int(rng.integers(1, 7)), b - p)
            if rng.random() < 0.2:
                # static-value run: source past the store -> stays invalid
                hd.append(p)
                hs.append(store + 10_000 + p)
                exp2[p:p + ln] = -1          # caller-spliced
            else:
                hd.append(p)
                hs.append(nxt)
                exp2[p:p + ln] = lm[nxt:nxt + ln]
            nxt += ln
            p += ln
    assert nxt <= store
    cp = KC.plan_compact(arc_start, src0, valid, m, store_elems=store,
                         hub_runs=(np.asarray(hd, dtype=np.int64),
                                   np.asarray(hs, dtype=np.int64)))
    assert cp is not None
    got = np.asarray(KC.compact(cp, jnp.asarray(lm), m, interpret=True))
    keep = exp2 != -1
    if cp.fb_dst is not None:
        keep[np.asarray(cp.fb_dst)] = False
    np.testing.assert_array_equal(got[keep], exp2[keep])
    # the far sources must have engaged window B in at least one block
    assert cp.WRB > 0
