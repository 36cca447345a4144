"""ScatteredArcsASCIIGraph — arbitrary-order arc-pair ingestion.

Re-design of ScatteredArcsASCIIGraph.java:60-155: arc pairs with arbitrary
64-bit (or string) identifiers arrive in any order; identifiers are remapped
to dense node ids in order of appearance (the mapping is persisted as the
``.ids`` file: binary longs, appearance order); pairs accumulate into sorted
disk batches and the result is a BatchGraph ready for any codec's store.

Where the reference hand-rolls an open-address big-array hash (Id2NodeMap
:155+), this implementation uses a dict for string keys and a vectorized
numpy unique-based remap for the bulk numeric path.
"""

from __future__ import annotations

import os
import tempfile
from typing import Callable, IO, Iterator, List, Optional, Tuple, Union

import numpy as np

from ..core.graph import CSRGraph, ImmutableGraph
from ..transform.offline import BatchGraph, process_batch

__all__ = ["ScatteredArcsASCIIGraph", "scattered_arcs_to_batches"]

DEFAULT_BATCH_SIZE = 10_000_000


def scattered_arcs_to_batches(
        sources: np.ndarray, targets: np.ndarray,
        symmetrize: bool = False, no_loops: bool = False,
        batch_size: int = DEFAULT_BATCH_SIZE,
        temp_dir: Optional[str] = None,
) -> Tuple[BatchGraph, np.ndarray]:
    """Bulk numeric ingestion: remap arbitrary int64 ids to dense nodes.

    Returns (batch_graph, ids): ``ids[i]`` is the original identifier of
    node i (appearance order, matching the ``.ids`` file semantics).
    """
    sources = np.asarray(sources, dtype=np.int64)
    targets = np.asarray(targets, dtype=np.int64)
    both = np.empty(2 * len(sources), dtype=np.int64)
    both[0::2] = sources  # interleave: appearance order is source, target,
    both[1::2] = targets  # source, target, ... exactly like the line parser
    uniq, first_idx, inv = np.unique(both, return_index=True,
                                     return_inverse=True)
    order = np.argsort(first_idx, kind="stable")
    rank = np.empty_like(order)
    rank[order] = np.arange(len(order))
    dense = rank[inv]
    src = dense[0::2]
    tgt = dense[1::2]
    ids = uniq[order]
    if no_loops:
        keep = src != tgt
        src, tgt = src[keep], tgt[keep]
    if symmetrize:
        src, tgt = (np.concatenate([src, tgt]), np.concatenate([tgt, src]))
    n = len(ids)
    temp_dir = temp_dir or tempfile.gettempdir()
    batches: List[str] = []
    total = 0
    for lo in range(0, max(len(src), 1), batch_size):
        s = src[lo:lo + batch_size]
        t = tgt[lo:lo + batch_size]
        if len(s):
            total += process_batch(s, t, temp_dir, batches)
    return BatchGraph(n, total, batches), ids


class ScatteredArcsASCIIGraph(ImmutableGraph):
    """Text ingestion: one arc per line, ids arbitrary (numeric or, with
    ``id_function``, any string mapped to int64)."""

    def __init__(self, stream_or_path: Union[str, IO[str]],
                 symmetrize: bool = False, no_loops: bool = False,
                 id_function: Optional[Callable[[str], int]] = None,
                 batch_size: int = DEFAULT_BATCH_SIZE,
                 temp_dir: Optional[str] = None):
        close = False
        if isinstance(stream_or_path, str):
            f = open(stream_or_path)
            close = True
        else:
            f = stream_or_path
        try:
            srcs: List[int] = []
            tgts: List[int] = []
            if id_function is None:
                for line in f:
                    line = line.strip()
                    if not line or line.startswith("#"):
                        continue
                    a, b = line.split()
                    srcs.append(int(a))
                    tgts.append(int(b))
            else:
                for line in f:
                    line = line.strip()
                    if not line or line.startswith("#"):
                        continue
                    a, b = line.split()
                    srcs.append(id_function(a))
                    tgts.append(id_function(b))
        finally:
            if close:
                f.close()
        self.batch_graph, self.ids = scattered_arcs_to_batches(
            np.asarray(srcs, dtype=np.int64),
            np.asarray(tgts, dtype=np.int64),
            symmetrize=symmetrize, no_loops=no_loops,
            batch_size=batch_size, temp_dir=temp_dir)
        self.properties = {}

    @property
    def num_nodes(self) -> int:
        return self.batch_graph.num_nodes

    @property
    def num_arcs(self) -> int:
        return self.batch_graph.num_arcs

    @property
    def random_access(self) -> bool:
        return False

    def successors(self, x: int) -> np.ndarray:
        raise RuntimeError("ScatteredArcsASCIIGraph is sequential-only")

    def iter_nodes(self, start: int = 0):
        return self.batch_graph.iter_nodes(start)

    def save_ids(self, path: str) -> None:
        """Write the ``.ids`` file: original ids in appearance order
        (binary big-endian longs, ScatteredArcsASCIIGraph.java ids file)."""
        np.asarray(self.ids, dtype=np.int64).astype(">i8").tofile(path)
