"""Transform engine tests (mirrors TransformTest, SURVEY §4.6)."""

import numpy as np
import pytest

from webgraph_tpu.core.graph import CSRGraph
from webgraph_tpu import transform as T

from .graphs import complete_graph, cycle_graph, erdos_renyi, star_graph


def brute_transpose(g):
    lists = [[] for _ in range(g.num_nodes)]
    for x, succ in g.iter_nodes():
        for t in succ.tolist():
            lists[t].append(x)
    return CSRGraph.from_lists([np.asarray(sorted(l), dtype=np.int64)
                                for l in lists])


def test_transpose():
    g = erdos_renyi(60, 0.1, seed=0)
    assert T.transpose(g).equals(brute_transpose(g))
    # double transpose is identity
    assert T.transpose(T.transpose(g)).equals(g)


def test_transpose_offline(tmp_path):
    g = erdos_renyi(300, 0.03, seed=1)
    bg = T.transpose_offline(g, batch_size=500, temp_dir=str(tmp_path))
    assert bg.num_arcs == g.num_arcs
    expect = brute_transpose(g)
    for (x, a), (y, b) in zip(bg.iter_nodes(), expect.iter_nodes()):
        assert x == y
        np.testing.assert_array_equal(a, b, err_msg=f"node {x}")
    bg.cleanup()


def test_symmetrize():
    g = erdos_renyi(50, 0.1, seed=2)
    s = T.symmetrize(g)
    # symmetric: equal to own transpose
    assert T.transpose(s).equals(s)
    # contains g
    for x, succ in g.iter_nodes():
        assert set(succ.tolist()) <= set(s.successors(x).tolist())


def test_symmetrize_offline(tmp_path):
    g = erdos_renyi(120, 0.05, seed=3)
    bg = T.symmetrize_offline(g, batch_size=300, temp_dir=str(tmp_path))
    expect = T.symmetrize(g)
    for (x, a), (y, b) in zip(bg.iter_nodes(), expect.iter_nodes()):
        np.testing.assert_array_equal(a, b)
    bg.cleanup()


def test_simplify():
    g = CSRGraph.from_lists([
        np.asarray([0, 1], dtype=np.int64),   # loop at 0
        np.asarray([2], dtype=np.int64),
        np.zeros(0, dtype=np.int64),
    ])
    s = T.simplify(g)
    for x in range(3):
        assert x not in s.successors(x)
    assert T.transpose(s).equals(s)
    bg = T.simplify_offline(g, batch_size=10)
    assert s.equals(bg.to_csr())
    bg.cleanup()


def test_map_offline_permutation():
    g = erdos_renyi(40, 0.15, seed=4)
    perm = T.random_permutation(g, seed=7)
    mapped = T.map_offline(g, perm)
    # mapped successors of perm[x] == perm[successors of x] sorted
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    for x, succ in g.iter_nodes():
        np.testing.assert_array_equal(mapped.successors(perm[x]),
                                      np.sort(perm[succ]))


def test_map_offline_merge_and_drop():
    g = cycle_graph(6)
    # merge pairs, drop node 5
    node_map = np.asarray([0, 0, 1, 1, 2, -1], dtype=np.int64)
    mapped = T.map_offline(g, node_map)
    assert mapped.num_nodes == 3
    # cycle arcs: 0->1,1->2,2->3,3->4,4->5,5->0 => (0,0),(0,1),(1,1),(1,2),(2,-)
    assert set(mapped.successors(0).tolist()) == {0, 1}
    assert set(mapped.successors(1).tolist()) == {1, 2}
    assert set(mapped.successors(2).tolist()) == set()
    bg = T.map_offline_batched(g, node_map, batch_size=3)
    assert mapped.equals(bg.to_csr())
    bg.cleanup()


def test_union():
    g0 = cycle_graph(5)
    g1 = star_graph(5)
    u = T.union(g0, g1)
    for x in range(5):
        assert (set(u.successors(x).tolist())
                == set(g0.successors(x).tolist())
                | set(g1.successors(x).tolist()))


def test_compose():
    # path graph 0->1->2->3; compose with itself = two-hop arcs
    g = CSRGraph.from_lists([np.asarray([1], dtype=np.int64),
                             np.asarray([2], dtype=np.int64),
                             np.asarray([3], dtype=np.int64),
                             np.zeros(0, dtype=np.int64)])
    c = T.compose(g, g)
    assert set(c.successors(0).tolist()) == {2}
    assert set(c.successors(1).tolist()) == {3}
    assert set(c.successors(2).tolist()) == set()
    # identity composition
    ident = CSRGraph.from_lists([np.asarray([i], dtype=np.int64)
                                 for i in range(4)])
    assert T.compose(g, ident).equals(g)
    assert T.compose(ident, g).equals(g)


def test_filter_arcs():
    g = complete_graph(6)  # with loops
    f = T.filter_arcs(g, T.no_loops)
    for x in range(6):
        assert x not in f.successors(x)
    cls = np.asarray([0, 0, 0, 1, 1, 1])
    f2 = T.filter_arcs(g, T.NodeClassFilter(cls))
    for x in range(6):
        assert all(cls[y] == cls[x] for y in f2.successors(x).tolist())


def test_random_permutation_is_bijection():
    g = erdos_renyi(30, 0.1, seed=5)
    p = T.random_permutation(g, seed=1)
    assert sorted(p.tolist()) == list(range(30))


def test_lexicographical_permutation():
    g = erdos_renyi(30, 0.2, seed=6)
    perm = T.lexicographical_permutation(g)
    # permuting ROWS ONLY by the sort order yields lexicographically sorted rows
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    rows = [tuple(g.successors(int(x)).tolist()) for x in inv]
    assert rows == sorted(rows)


def test_gray_code_permutation():
    g = erdos_renyi(25, 0.3, seed=7)
    perm = T.gray_code_permutation(g)
    assert sorted(perm.tolist()) == list(range(25))
    # Gray order: eager oracle from the reference's documentation comment
    # (Transform.java:1953-1963): bit-vector with columns reversed, suffix
    # xor, compare most-significant first.
    n = g.num_nodes

    def gray_key(x):
        bits = np.zeros(n, dtype=np.int64)
        for s in g.successors(x).tolist():
            bits[n - 1 - s] = 1
        for k in range(n - 2, -1, -1):
            bits[k] ^= bits[k + 1]
        return tuple(bits[::-1].tolist())  # most significant = index n-1

    inv = np.empty_like(perm)
    inv[perm] = np.arange(n)
    keys = [gray_key(int(x)) for x in inv]
    assert keys == sorted(keys)


def test_batchgraph_mid_stream_split(tmp_path):
    """iter_nodes(start) positions the k-way merge mid-stream (no replay
    from node 0) and agrees with a full scan — the copiable-iterator
    contract of Transform.java:771-789."""
    from webgraph_tpu.transform.offline import transpose_offline

    rng = np.random.default_rng(7)
    src = rng.integers(0, 300, 5000)
    tgt = rng.integers(0, 300, 5000)
    g = CSRGraph.from_arcs(src, tgt, 300)
    bt = transpose_offline(g, batch_size=600, temp_dir=str(tmp_path))
    assert len(bt.batches) > 3
    full = {x: succ.tolist() for x, succ in bt.iter_nodes()}
    for start in (0, 1, 137, 299, 300):
        part = {x: succ.tolist() for x, succ in bt.iter_nodes(start)}
        assert part == {x: v for x, v in full.items() if x >= start}
    # split halves re-join to the full graph
    csr_a = bt.to_csr(0, 150)
    csr_b = bt.to_csr(150, 300)
    joined = np.concatenate([csr_a.succ, csr_b.succ])
    full_csr = bt.to_csr()
    np.testing.assert_array_equal(joined, full_csr.succ)
    bt.cleanup()
