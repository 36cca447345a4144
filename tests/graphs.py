"""Synthetic test-graph generators.

Mirrors the fixtures the reference test-suite builds with
ArrayListMutableGraph.newCompleteGraph/newCompleteBinaryIntree/
newCompleteBinaryOuttree and ErdosRenyiGraph (SURVEY §4).
"""

import numpy as np

from webgraph_tpu.core.graph import CSRGraph


def complete_graph(n: int, loops: bool = True) -> CSRGraph:
    lists = []
    for x in range(n):
        succ = [y for y in range(n) if loops or y != x]
        lists.append(np.asarray(succ, dtype=np.int64))
    return CSRGraph.from_lists(lists)


def complete_binary_intree(height: int) -> CSRGraph:
    """Nodes point to their parent; root is 0; 2^(h+1)-1 nodes."""
    n = (1 << (height + 1)) - 1
    lists = [np.zeros(0, dtype=np.int64)]
    for x in range(1, n):
        lists.append(np.asarray([(x - 1) // 2], dtype=np.int64))
    return CSRGraph.from_lists(lists)


def complete_binary_outtree(height: int) -> CSRGraph:
    n = (1 << (height + 1)) - 1
    lists = []
    for x in range(n):
        kids = [2 * x + 1, 2 * x + 2]
        lists.append(np.asarray([k for k in kids if k < n], dtype=np.int64))
    return CSRGraph.from_lists(lists)


def erdos_renyi(n: int, p: float, seed: int = 0, loops: bool = False) -> CSRGraph:
    rng = np.random.default_rng(seed)
    lists = []
    for x in range(n):
        mask = rng.random(n) < p
        if not loops:
            mask[x] = False
        lists.append(np.flatnonzero(mask).astype(np.int64))
    return CSRGraph.from_lists(lists)


def cycle_graph(n: int) -> CSRGraph:
    return CSRGraph.from_lists(
        [np.asarray([(x + 1) % n], dtype=np.int64) for x in range(n)])


def star_graph(n: int) -> CSRGraph:
    lists = [np.arange(1, n, dtype=np.int64)]
    lists += [np.asarray([0], dtype=np.int64) for _ in range(n - 1)]
    return CSRGraph.from_lists(lists)
