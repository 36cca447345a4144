"""External-memory transformation machinery.

Host-side analogue of the reference's disk-batch external sort
(Transform.processBatch :938-974; BatchGraph k-way heap merge :709-926):
arc pairs accumulate into fixed-size buffers, each full buffer is sorted,
deduplicated, delta-compressed and spilled to a temp file; a BatchGraph then
merges all batches lazily in node order, feeding any codec's ``store``.

Batches are compressed with the same gap coding idea as the reference
(sorted sources as gaps, targets as int2nat deltas) but serialized as numpy
arrays for mmap-friendly reload; the format is internal, not a compatibility
surface.
"""

from __future__ import annotations

import heapq
import os
import tempfile
from typing import Iterator, List, Optional, Tuple

import numpy as np

from ..core.graph import CSRGraph, ImmutableGraph

__all__ = ["process_batch", "BatchGraph", "transpose_offline",
           "symmetrize_offline", "simplify_offline", "map_offline_batched"]

DEFAULT_BATCH_SIZE = 10_000_000  # pairs (Transform.java DEFAULT_BATCH_SIZE)


def process_batch(src: np.ndarray, tgt: np.ndarray, temp_dir: str,
                  batches: List[str]) -> int:
    """Sort (source, target) pairs, dedup, spill to a temp file.

    Returns the number of unique pairs written (Transform.processBatch
    :938-974 semantics: parallel quicksort + dedup + gap-coded spill).
    """
    order = np.lexsort((tgt, src))
    src, tgt = src[order], tgt[order]
    if len(src):
        keep = np.concatenate(
            [[True], (src[1:] != src[:-1]) | (tgt[1:] != tgt[:-1])])
        src, tgt = src[keep], tgt[keep]
    fd, path = tempfile.mkstemp(suffix=".batch.npy", dir=temp_dir)
    os.close(fd)
    # plain (2, k) int64 .npy so merges can mmap it: the k-way merge then
    # streams every batch through the page cache instead of materializing
    # all batches in RAM (the reference streams its batch files through
    # small input-bit-stream buffers, Transform.java:709-780)
    arr = np.empty((2, len(src)), dtype=np.int64)
    arr[0] = src
    arr[1] = tgt
    np.save(path, arr)
    batches.append(path)
    return len(src)


def _load_batch(path: str) -> Tuple[np.ndarray, np.ndarray]:
    arr = np.load(path, mmap_mode="r")
    return arr[0], arr[1]


class BatchGraph(ImmutableGraph):
    """Sequential graph lazily merging sorted batch files (BatchGraph
    :709-926).  Iteration merges all batches with a heap over per-batch
    cursors; per-node lists are deduplicated across batches."""

    def __init__(self, num_nodes: int, num_arcs: int, batches: List[str]):
        self._n = num_nodes
        self._m = num_arcs
        self.batches = batches
        self.properties = {}

    @property
    def num_nodes(self) -> int:
        return self._n

    @property
    def num_arcs(self) -> int:
        return self._m

    @property
    def random_access(self) -> bool:
        return False

    def successors(self, x: int) -> np.ndarray:
        raise RuntimeError("BatchGraph is sequential-only")

    def iter_nodes(self, start: int = 0) -> Iterator[Tuple[int, np.ndarray]]:
        """Merge-iterate from ``start``.  Positioning is O(log) per batch
        (binary search on the sorted source column), NOT a replay from node
        0 — the copiable-iterator contract that lets a multithreaded store
        split the k-way merge at arbitrary node bounds exactly like the
        reference re-opens its batch files per split (Transform.java
        :771-789, NodeIterator.copy(upperBound))."""
        streams = [_load_batch(p) for p in self.batches]
        # per-batch cursor into its sorted (src, tgt) arrays, positioned at
        # the first pair with source >= start
        cursors = [int(np.searchsorted(s, start)) for s, _ in streams]
        heap = []
        for bi, (s, t) in enumerate(streams):
            c = cursors[bi]
            if c < len(s):
                heapq.heappush(heap, (int(s[c]), bi))
        empty = np.zeros(0, dtype=np.int64)
        for x in range(start, self._n):
            if not heap or heap[0][0] != x:
                yield x, empty
                continue
            parts = []
            while heap and heap[0][0] == x:
                _, bi = heapq.heappop(heap)
                s, t = streams[bi]
                c = cursors[bi]
                e = c
                while e < len(s) and s[e] == x:
                    e += 1
                parts.append(t[c:e])
                cursors[bi] = e
                if e < len(s):
                    heapq.heappush(heap, (int(s[e]), bi))
            succ = np.unique(np.concatenate(parts))
            yield x, succ

    def cleanup(self) -> None:
        for p in self.batches:
            try:
                os.unlink(p)
            except OSError:
                pass


def _batched_arc_stream(arc_iter, num_nodes: int, batch_size: int,
                        temp_dir: Optional[str]) -> BatchGraph:
    temp_dir = temp_dir or tempfile.gettempdir()
    batches: List[str] = []
    srcs = np.empty(batch_size, dtype=np.int64)
    tgts = np.empty(batch_size, dtype=np.int64)
    fill = 0
    total = 0
    for s_arr, t_arr in arc_iter:
        o = 0
        while o < len(s_arr):
            take = min(batch_size - fill, len(s_arr) - o)
            srcs[fill:fill + take] = s_arr[o:o + take]
            tgts[fill:fill + take] = t_arr[o:o + take]
            fill += take
            o += take
            if fill == batch_size:
                total += process_batch(srcs[:fill], tgts[:fill], temp_dir,
                                       batches)
                fill = 0
    if fill:
        total += process_batch(srcs[:fill], tgts[:fill], temp_dir, batches)
    return BatchGraph(num_nodes, total, batches)


def transpose_offline(g: ImmutableGraph,
                      batch_size: int = DEFAULT_BATCH_SIZE,
                      temp_dir: Optional[str] = None) -> BatchGraph:
    """Out-of-core transpose (Transform.transposeOffline :1058-1144)."""

    def arcs():
        for x, succ in g.iter_nodes():
            if len(succ):
                yield (np.asarray(succ, dtype=np.int64),
                       np.full(len(succ), x, dtype=np.int64))

    return _batched_arc_stream(arcs(), g.num_nodes, batch_size, temp_dir)


def symmetrize_offline(g: ImmutableGraph,
                       batch_size: int = DEFAULT_BATCH_SIZE,
                       temp_dir: Optional[str] = None) -> BatchGraph:
    """Out-of-core symmetrization (Transform.symmetrizeOffline :546-633)."""

    def arcs():
        for x, succ in g.iter_nodes():
            if len(succ):
                s = np.asarray(succ, dtype=np.int64)
                xx = np.full(len(succ), x, dtype=np.int64)
                yield xx, s
                yield s, xx

    return _batched_arc_stream(arcs(), g.num_nodes, batch_size, temp_dir)


def simplify_offline(g: ImmutableGraph,
                     batch_size: int = DEFAULT_BATCH_SIZE,
                     temp_dir: Optional[str] = None) -> BatchGraph:
    """Out-of-core symmetrize + loop removal (Transform.simplifyOffline)."""

    def arcs():
        for x, succ in g.iter_nodes():
            if len(succ):
                s = np.asarray(succ, dtype=np.int64)
                s = s[s != x]
                if len(s):
                    xx = np.full(len(s), x, dtype=np.int64)
                    yield xx, s
                    yield s, xx

    return _batched_arc_stream(arcs(), g.num_nodes, batch_size, temp_dir)


def map_offline_batched(g: ImmutableGraph, node_map: np.ndarray,
                        num_nodes: Optional[int] = None,
                        batch_size: int = DEFAULT_BATCH_SIZE,
                        temp_dir: Optional[str] = None) -> BatchGraph:
    """Out-of-core node mapping (Transform.mapOffline :1160-1279)."""
    node_map = np.asarray(node_map, dtype=np.int64)
    if num_nodes is None:
        num_nodes = int(node_map.max(initial=-1)) + 1

    def arcs():
        for x, succ in g.iter_nodes():
            mx = node_map[x]
            if mx < 0 or not len(succ):
                continue
            mt = node_map[np.asarray(succ, dtype=np.int64)]
            mt = mt[mt >= 0]
            if len(mt):
                yield np.full(len(mt), mx, dtype=np.int64), mt

    return _batched_arc_stream(arcs(), num_nodes, batch_size, temp_dir)
