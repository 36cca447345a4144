"""Analytics tests with independent oracles (mirrors the reference's
oracle-testing discipline: SequentialHyperBall, recursive Tarjan — SURVEY §4.4).
"""

import sys

import numpy as np
import pytest

from webgraph_tpu import algo
from webgraph_tpu import transform as T
from webgraph_tpu.core.graph import CSRGraph

from .graphs import complete_graph, cycle_graph, erdos_renyi, star_graph


# -- oracles ---------------------------------------------------------------


def bfs_oracle(g, roots):
    from collections import deque
    dist = np.full(g.num_nodes, -1, dtype=np.int64)
    q = deque()
    for r in np.atleast_1d(roots):
        dist[r] = 0
        q.append(int(r))
    while q:
        x = q.popleft()
        for y in g.successors(x).tolist():
            if dist[y] < 0:
                dist[y] = dist[x] + 1
                q.append(y)
    return dist


def tarjan_oracle(g):
    """Recursive Tarjan (the reference's test oracle)."""
    n = g.num_nodes
    sys.setrecursionlimit(10000 + 10 * n)
    index = np.full(n, -1)
    low = np.zeros(n, dtype=np.int64)
    on_stack = np.zeros(n, dtype=bool)
    stack = []
    comp = np.full(n, -1, dtype=np.int64)
    counter = [0]
    ncomp = [0]

    def strongconnect(v):
        index[v] = low[v] = counter[0]
        counter[0] += 1
        stack.append(v)
        on_stack[v] = True
        for w in g.successors(v).tolist():
            if index[w] < 0:
                strongconnect(w)
                low[v] = min(low[v], low[w])
            elif on_stack[w]:
                low[v] = min(low[v], index[w])
        if low[v] == index[v]:
            while True:
                w = stack.pop()
                on_stack[w] = False
                comp[w] = ncomp[0]
                if w == v:
                    break
            ncomp[0] += 1

    for v in range(n):
        if index[v] < 0:
            strongconnect(v)
    return ncomp[0], comp


def same_partition(a, b):
    """Two labelings describe the same partition."""
    a, b = np.asarray(a), np.asarray(b)
    if a.shape != b.shape:
        return False
    pairs = set(zip(a.tolist(), b.tolist()))
    return (len({p[0] for p in pairs}) == len(pairs)
            and len({p[1] for p in pairs}) == len(pairs))


# -- BFS --------------------------------------------------------------------


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_bfs(seed):
    g = erdos_renyi(80, 0.05, seed=seed)
    dist, rounds = algo.bfs(g, [0])
    np.testing.assert_array_equal(dist, bfs_oracle(g, [0]))


def test_bfs_multi_source():
    g = erdos_renyi(60, 0.04, seed=3)
    dist, _ = algo.bfs(g, [0, 17, 42])
    np.testing.assert_array_equal(dist, bfs_oracle(g, [0, 17, 42]))


def test_visit_queue_and_cutpoints():
    g = cycle_graph(10)
    queue, cuts = algo.visit(g, 3)
    assert queue.tolist() == [3, 4, 5, 6, 7, 8, 9, 0, 1, 2]
    assert cuts.tolist() == list(range(11))


def test_visit_all_rounds():
    g = CSRGraph.from_lists([
        np.asarray([1], dtype=np.int64), np.zeros(0, dtype=np.int64),
        np.asarray([3], dtype=np.int64), np.zeros(0, dtype=np.int64)])
    marks = algo.visit_all(g)
    assert marks.tolist() == [0, 0, 1, 1]


def test_arc_balanced_ranges():
    g = star_graph(100)
    ranges = algo.arc_balanced_ranges(g.to_csr().offsets, 4)
    assert ranges[0][0] == 0 and ranges[-1][1] == 100
    arcs = [int(g.to_csr().offsets[hi] - g.to_csr().offsets[lo])
            for lo, hi in ranges]
    assert sum(arcs) == g.num_arcs


# -- connected components ----------------------------------------------------


@pytest.mark.parametrize("seed,p", [(0, 0.01), (1, 0.03), (2, 0.1)])
def test_connected_components(seed, p):
    g = T.symmetrize(erdos_renyi(100, p, seed=seed))
    comp = algo.connected_components(g)
    # oracle via repeated BFS
    oracle = np.full(100, -1, dtype=np.int64)
    c = 0
    for x in range(100):
        if oracle[x] < 0:
            d = bfs_oracle(g, [x])
            oracle[(d >= 0) & (oracle < 0)] = c
            c += 1
    assert same_partition(comp, oracle)
    sizes = algo.compute_sizes(comp)
    assert sizes.sum() == 100
    by_size = algo.sort_by_size(comp)
    s2 = algo.compute_sizes(by_size)
    assert all(s2[i] >= s2[i + 1] for i in range(len(s2) - 1))


# -- strongly connected components -------------------------------------------


@pytest.mark.parametrize("seed,p", [(0, 0.02), (1, 0.05), (2, 0.1), (3, 0.3)])
def test_scc_vs_tarjan(seed, p):
    g = erdos_renyi(70, p, seed=seed)
    k, comp = algo.strongly_connected_components(g)
    k2, oracle = tarjan_oracle(g)
    assert k == k2
    assert same_partition(comp, oracle)


def test_scc_structured():
    # two 3-cycles joined by a one-way arc + a dangling tail
    lists = [
        [1], [2], [0, 3],          # cycle A -> B
        [4], [5], [3, 6],          # cycle B -> tail
        [],                        # tail
    ]
    g = CSRGraph.from_lists([np.asarray(l, dtype=np.int64) for l in lists])
    k, comp = algo.strongly_connected_components(g)
    k2, oracle = tarjan_oracle(g)
    assert k == k2 == 3
    assert same_partition(comp, oracle)
    buckets = algo.scc_buckets(g, comp)
    # only the tail's component is terminal, but it is dangling (size 1, no
    # loop) => no buckets... the B-cycle points to the tail so not terminal.
    assert buckets.sum() == 0
    # make the tail a self-loop: then it's terminal and non-dangling
    lists[6] = [6]
    g2 = CSRGraph.from_lists([np.asarray(l, dtype=np.int64) for l in lists])
    k, comp = algo.strongly_connected_components(g2)
    assert algo.scc_buckets(g2, comp).sum() == 1


# -- HyperBall ----------------------------------------------------------------


def test_hyperball_vs_sequential_registers():
    g = erdos_renyi(60, 0.06, seed=4)
    hb = algo.HyperBall(g, log2m=4, seed=1)
    hb.run()
    seq_regs = algo.sequential_hyperball(g, log2m=4, seed=1)
    np.testing.assert_array_equal(np.asarray(hb.regs), seq_regs)


def test_hyperball_neighbourhood_function_exact_small():
    # on a cycle, |B(x, t)| = t+1; NF(t) = n*(t+1) until saturation.
    # HLL is approximate: check relative error with generous bounds.
    n = 40
    g = cycle_graph(n)
    hb = algo.HyperBall(g, log2m=6, seed=0)
    nf = hb.run()
    assert nf[0] == n
    # exact NF grows linearly; estimates within 30%
    for t in range(1, min(5, len(nf))):
        exact = n * (t + 1)
        assert abs(nf[t] - exact) / exact < 0.3
    # saturation: last estimate ~ n*n
    exact_total = n * n
    assert abs(nf[-1] - exact_total) / exact_total < 0.3


def test_hyperball_systolic_local_register_exact():
    # A long path with a small cluster: after a couple of rounds only the
    # wavefront's counters change, so sparse rounds engage (HyperBall.java
    # :1011 systolic / :1021 local).  Registers must stay identical to the
    # dense run and the sequential oracle, with per-round arc work dropping.
    lists = [[i + 1] for i in range(299)] + [[0, 150]]
    g = CSRGraph.from_lists([np.asarray(l, dtype=np.int64) for l in lists])
    gt = g.transpose()
    hb = algo.HyperBall(g, log2m=4, seed=3, gt=gt)
    hb.run()
    seq_regs = algo.sequential_hyperball(g, log2m=4, seed=3)
    np.testing.assert_array_equal(np.asarray(hb.regs), seq_regs)
    assert "systolic" in hb.mode_history
    assert "local" in hb.mode_history  # the path wavefront is 1-2 nodes


def test_hyperball_sparse_modes_engage_and_cost_drops():
    rng = np.random.default_rng(7)
    n = 400
    lists = []
    for i in range(n):
        deg = rng.integers(1, 5)
        lists.append(np.unique(rng.integers(0, n, deg)).astype(np.int64))
    g = CSRGraph.from_lists(lists)
    gt = g.transpose()
    hb_sparse = algo.HyperBall(g, log2m=5, seed=2, gt=gt)
    hb_dense = algo.HyperBall(g, log2m=5, seed=2)
    hb_sparse.run()
    hb_dense.run()
    np.testing.assert_array_equal(np.asarray(hb_sparse.regs),
                                  np.asarray(hb_dense.regs))
    assert "systolic" in hb_sparse.mode_history
    # sparse rounds touch fewer arcs than m
    sparse_rounds = [a for md, a in zip(hb_sparse.mode_history,
                                        hb_sparse.arcs_touched)
                     if md != "dense"]
    assert sparse_rounds and min(sparse_rounds) < g.num_arcs


def test_hyperball_save_load_resume(tmp_path):
    g = erdos_renyi(50, 0.08, seed=9)
    hb = algo.HyperBall(g, log2m=4, seed=1, gt=g.transpose(),
                        do_sum_of_distances=True)
    hb.iterate()
    hb.iterate()
    p = str(tmp_path / "state.npz")
    hb.save_state(p)
    hb.run()
    hb2 = algo.HyperBall(g, log2m=4, seed=1, gt=g.transpose(),
                         do_sum_of_distances=True)
    hb2.load_state(p)
    hb2.run()
    np.testing.assert_array_equal(np.asarray(hb.regs), np.asarray(hb2.regs))
    np.testing.assert_allclose(hb.sum_of_distances, hb2.sum_of_distances)
    assert hb.neighbourhood_function == hb2.neighbourhood_function


def test_hyperball_centralities_accumulate():
    g = cycle_graph(8)
    hb = algo.HyperBall(g, log2m=6, seed=0, do_sum_of_distances=True,
                        do_sum_of_inverse_distances=True)
    hb.run()
    assert hb.sum_of_distances is not None
    assert (hb.sum_of_distances > 0).all()
    assert (hb.sum_of_inverse_distances > 0).all()


# -- geometric centralities ----------------------------------------------------


def test_harmonic_centrality_exact():
    g = cycle_graph(6)
    got = algo.harmonic_centrality(g, batch=4)
    exact = sum(1.0 / d for d in range(1, 6))
    np.testing.assert_allclose(got, exact)


def test_closeness_centrality_star():
    g = star_graph(5)  # 0 -> all, leaves -> 0
    got = algo.closeness_centrality(g)
    # center: distances 1,1,1,1 -> 1/4 ; leaf: 1 + 2*3 = 7 -> 1/7
    np.testing.assert_allclose(got[0], 1 / 4)
    np.testing.assert_allclose(got[1:], 1 / 7)


def test_linear_geometric_matches_bfs():
    g = erdos_renyi(40, 0.08, seed=5)
    got = algo.harmonic_centrality(g, batch=16)
    exact = np.zeros(40)
    for x in range(40):
        d = bfs_oracle(g, [x])
        exact[x] = sum(1.0 / dd for dd in d[(d > 0)])
    np.testing.assert_allclose(got, exact, rtol=1e-9)


def test_effective_diameter():
    # cycle graph: NF(t) = n*(t+1) until n*n; effective diameter ~ 0.9*(n-1)
    n = 30
    g = cycle_graph(n)
    hb = algo.HyperBall(g, log2m=7, seed=0)
    nf = hb.run()
    ed = algo.effective_diameter(nf, 0.9)
    exact_nf = [n * min(t + 1, n) for t in range(len(nf))]
    exact_ed = algo.effective_diameter(exact_nf, 0.9)
    assert abs(ed - exact_ed) / exact_ed < 0.25
    assert algo.effective_diameter([], 0.9) == 0.0
    assert algo.effective_diameter([5.0], 0.9) == 0.0


def test_hyperball_external_register_exact(tmp_path):
    """External mode (host/memmap registers, chunked device merges,
    buffered update lists — HyperBall.java:268-273, :1104-1130) is
    register-exact vs the sequential oracle, dense and sparse."""
    g = erdos_renyi(120, 0.05, seed=9)
    seq_regs = algo.sequential_hyperball(g, log2m=4, seed=1)
    # in-memory host registers, tiny chunks force many batches per round
    hb = algo.HyperBall(g, log2m=4, seed=1, external_chunk=64)
    hb.run()
    np.testing.assert_array_equal(np.asarray(hb.regs), seq_regs)
    assert "dense-external" in hb.mode_history
    # disk-backed memmap registers + systolic/local sparse rounds
    gt = g.transpose()
    hb2 = algo.HyperBall(g, log2m=4, seed=1, gt=gt, external_chunk=64,
                         regs_path=str(tmp_path / "regs.npy"))
    hb2.run()
    np.testing.assert_array_equal(np.asarray(hb2.regs), seq_regs)
    assert any(m.endswith("-external") and m != "dense-external"
               for m in hb2.mode_history)
    # NF identical between external and standard runs
    hb3 = algo.HyperBall(g, log2m=4, seed=1)
    hb3.run()
    assert hb3.neighbourhood_function == hb.neighbourhood_function


def test_hyperball_device_round_matches_host():
    """device_round on a device CSR == one dense host-formulated round
    (decode -> analytics with no host roundtrip)."""
    import jax.numpy as jnp

    from webgraph_tpu.algo import hyperball as HB

    g = erdos_renyi(200, 0.05, seed=13)
    csr = g.to_csr()
    regs = HB.hyperloglog_init(g.num_nodes, 4)
    src = np.repeat(np.arange(g.num_nodes), np.diff(csr.offsets))
    exp = np.asarray(HB._hb_round(jnp.asarray(src.astype(np.int32)),
                                  jnp.asarray(csr.succ.astype(np.int32)),
                                  jnp.asarray(regs)))
    got = np.asarray(HB.device_round(csr.offsets,
                                     jnp.asarray(csr.succ.astype(np.int32)),
                                     jnp.asarray(regs)))
    np.testing.assert_array_equal(got, exp)


def test_packed_centrality_matches_dense(monkeypatch):
    """The u32-bitmap frontier formulation (large-graph path) must agree
    with the dense boolean one."""
    from webgraph_tpu.algo import centrality as C

    g = erdos_renyi(120, 0.05, seed=3)
    want = algo.harmonic_centrality(g, batch=32)
    monkeypatch.setattr(C, "DENSE_LIMIT", 1)
    monkeypatch.setattr(C, "PACKED_CHUNK", 97)  # force multi-chunk buckets
    got = algo.harmonic_centrality(g, batch=32)
    np.testing.assert_allclose(got, want)


def test_hyperball_packed_round_matches_u8():
    """The packed-u32 register round must merge identically to the u8
    formulation (the broadword packing of HyperLogLogCounterArray)."""
    import jax.numpy as jnp
    from webgraph_tpu.algo import hyperball as HB

    g = erdos_renyi(300, 0.03, seed=9)
    csr = g.to_csr()
    regs = HB.hyperloglog_init(300, 4)
    want = np.asarray(HB.device_round(
        np.asarray(csr.offsets), jnp.asarray(csr.succ.astype(np.int32)),
        jnp.asarray(regs)))
    packed = HB.pack_registers(jnp.asarray(regs))
    got = np.asarray(HB.unpack_registers(HB.device_round(
        np.asarray(csr.offsets), jnp.asarray(csr.succ.astype(np.int32)),
        packed)))
    np.testing.assert_array_equal(got, want)


def test_hyperball_dense_plan_wide_class_chunks():
    """Nodes wider than the widest degree class split into chunk levels;
    every chunk's contribution must merge (unique scatter rows per pass)."""
    import jax.numpy as jnp
    from webgraph_tpu.algo import hyperball as HB

    rng = np.random.default_rng(3)
    n = 150
    # node 0: degree 100 (>> 2^3); others sparse
    lists = [np.sort(rng.choice(np.arange(1, n), 100, replace=False))]
    for x in range(1, n):
        k = rng.integers(0, 4)
        lists.append(np.sort(rng.choice(n, k, replace=False)))
    g = CSRGraph.from_lists(lists)
    csr = g.to_csr()
    regs = HB.hyperloglog_init(n, 4)
    want = np.asarray(HB.device_round(
        np.asarray(csr.offsets), jnp.asarray(csr.succ.astype(np.int32)),
        jnp.asarray(regs)))
    plan = HB.DenseRoundPlan(np.asarray(csr.offsets),
                             jnp.asarray(csr.succ.astype(np.int32)),
                             max_class=3)
    assert len(plan.classes) > 4  # wide chunk levels present
    got = np.asarray(HB.unpack_registers(
        plan.round(HB.pack_registers(jnp.asarray(regs)))))
    np.testing.assert_array_equal(got, want)
