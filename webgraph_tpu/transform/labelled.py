"""Labelled external-memory transforms.

The labelled analogues of the batch machinery: arcs spill to sorted batch
files together with a per-batch label bit stream (the reference's
``processTransposeBatch``, Transform.java:990-1048, keeps label bit
positions and rewrites labels per batch the same way), and a
``LabelledBatchGraph`` merges the batches in node order, resolving
duplicate arcs with a ``LabelMergeStrategy``.

Covers: labelled transposeOffline (Transform.java:1281-1456), labelled
symmetrizeOffline with merge strategy (:546-633), labelled compose with a
LabelSemiring (:1792).
"""

from __future__ import annotations

import os
import tempfile
from typing import Callable, Dict, Iterator, List, Optional, Tuple

import numpy as np

from ..core.graph import CSRGraph, ImmutableGraph
from ..labelling.graph import ArcLabelledGraph, LabelSemiring
from ..labelling.labels import Label
from ..ops.bitio import BitReader, BitWriter
from .offline import DEFAULT_BATCH_SIZE

__all__ = ["process_labelled_batch", "LabelledBatchGraph",
           "transpose_offline_labelled", "symmetrize_offline_labelled",
           "compose_labelled"]


def process_labelled_batch(src: np.ndarray, tgt: np.ndarray,
                           labels: List[Label], temp_dir: str,
                           batches: List[str]) -> int:
    """Sort (source, target, label) triples by (source, target) and spill.

    Unlike the plain ``process_batch``, duplicates are KEPT — merging
    duplicate arcs needs the labels and happens at consumption time with a
    merge strategy (Transform.processTransposeBatch :990-1048 keeps one
    label per arc the same way).  Returns the number of pairs written."""
    order = np.lexsort((tgt, src))
    src, tgt = src[order], tgt[order]
    w = BitWriter()
    loffs = np.empty(len(src) + 1, dtype=np.int64)
    for i, oi in enumerate(order.tolist()):
        loffs[i] = w.written_bits
        labels[oi].to_bitstream(w, int(src[i]))
    loffs[len(src)] = w.written_bits
    fd, path = tempfile.mkstemp(suffix=".lbatch.npz", dir=temp_dir)
    os.close(fd)
    np.savez(path, s=np.diff(src, prepend=0).astype(np.int64),
             t=tgt.astype(np.int64), loffs=loffs,
             lbits=np.frombuffer(w.to_bytes(), dtype=np.uint8))
    batches.append(path)
    return len(src)


def _load_labelled_batch(path: str):
    z = np.load(path)
    return np.cumsum(z["s"]), z["t"], z["loffs"], z["lbits"]


class LabelledBatchGraph(ImmutableGraph):
    """Sequential labelled graph merging sorted labelled batch files.

    ``merge`` resolves duplicate (x, t) arcs across (or within) batches —
    the LabelMergeStrategy of the reference's labelled union/symmetrize
    (Transform.java:546-633); with ``merge=None`` the first occurrence in
    batch order wins."""

    def __init__(self, num_nodes: int, num_arcs: int, batches: List[str],
                 prototype: Label,
                 merge: Optional[Callable[[Label, Label], Label]] = None):
        self._n = num_nodes
        self._m = num_arcs  # pairs spilled (pre-merge upper bound)
        self.batches = batches
        self.prototype = prototype
        self.merge = merge
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
        raise RuntimeError("LabelledBatchGraph is sequential-only")

    def iter_labelled(self, start: int = 0
                      ) -> Iterator[Tuple[int, np.ndarray, List[Label]]]:
        streams = [_load_labelled_batch(p) for p in self.batches]
        readers = [BitReader(lb) for _, _, _, lb in streams]
        cursors = [0] * len(streams)
        empty = np.zeros(0, dtype=np.int64)
        for x in range(start, self._n):
            pairs: Dict[int, Label] = {}
            for bi, (s, t, loffs, _) in enumerate(streams):
                c = cursors[bi]
                e = c
                while e < len(s) and s[e] == x:
                    e += 1
                if e > c:
                    r = readers[bi]
                    for k in range(c, e):
                        r.position(int(loffs[k]))
                        lab = self.prototype.copy()
                        lab.from_bitstream(r, x)
                        tk = int(t[k])
                        if tk in pairs and self.merge is not None:
                            pairs[tk] = self.merge(pairs[tk], lab)
                        elif tk not in pairs:
                            pairs[tk] = lab
                    cursors[bi] = e
            keys = sorted(pairs)
            yield (x, np.asarray(keys, dtype=np.int64),
                   [pairs[k] for k in keys])

    def iter_nodes(self, start: int = 0):
        for x, succ, _ in self.iter_labelled(start):
            yield x, succ

    def to_arc_labelled(self) -> ArcLabelledGraph:
        lists: List[np.ndarray] = []
        labels: List[Label] = []
        for _x, succ, labs in self.iter_labelled():
            lists.append(succ)
            labels.extend(labs)
        return ArcLabelledGraph(CSRGraph.from_lists(lists), labels,
                                self.prototype)

    def cleanup(self) -> None:
        for p in self.batches:
            try:
                os.unlink(p)
            except OSError:
                pass


def _spill_labelled(arc_iter, num_nodes: int, prototype: Label,
                    batch_size: int, temp_dir: Optional[str],
                    merge) -> LabelledBatchGraph:
    temp_dir = temp_dir or tempfile.gettempdir()
    batches: List[str] = []
    srcs = np.empty(batch_size, dtype=np.int64)
    tgts = np.empty(batch_size, dtype=np.int64)
    labs: List[Label] = []
    fill = 0
    total = 0
    for s_arr, t_arr, l_list in arc_iter:
        o = 0
        while o < len(s_arr):
            take = min(batch_size - fill, len(s_arr) - o)
            srcs[fill:fill + take] = s_arr[o:o + take]
            tgts[fill:fill + take] = t_arr[o:o + take]
            labs.extend(l_list[o:o + take])
            fill += take
            o += take
            if fill == batch_size:
                total += process_labelled_batch(srcs[:fill], tgts[:fill],
                                                labs, temp_dir, batches)
                labs = []
                fill = 0
    if fill:
        total += process_labelled_batch(srcs[:fill], tgts[:fill], labs,
                                        temp_dir, batches)
    return LabelledBatchGraph(num_nodes, total, batches, prototype, merge)


def transpose_offline_labelled(g, batch_size: int = DEFAULT_BATCH_SIZE,
                               temp_dir: Optional[str] = None
                               ) -> LabelledBatchGraph:
    """Labelled out-of-core transpose (Transform.java:1281-1456): arc
    (x, y, l) becomes (y, x, l)."""

    def arcs():
        for x, succ, labs in g.iter_labelled():
            if len(succ):
                yield (np.asarray(succ, dtype=np.int64),
                       np.full(len(succ), x, dtype=np.int64), list(labs))

    return _spill_labelled(arcs(), g.num_nodes, g.prototype, batch_size,
                           temp_dir, merge=None)


def symmetrize_offline_labelled(g, merge: Callable[[Label, Label], Label],
                                batch_size: int = DEFAULT_BATCH_SIZE,
                                temp_dir: Optional[str] = None
                                ) -> LabelledBatchGraph:
    """Labelled out-of-core symmetrization = union of the graph and its
    transpose, duplicate arcs resolved by ``merge``
    (Transform.symmetrizeOffline labelled, :546-633)."""

    def arcs():
        for x, succ, labs in g.iter_labelled():
            if len(succ):
                s = np.asarray(succ, dtype=np.int64)
                xx = np.full(len(s), x, dtype=np.int64)
                ll = list(labs)
                yield xx, s, ll
                yield s, xx, ll

    return _spill_labelled(arcs(), g.num_nodes, g.prototype, batch_size,
                           temp_dir, merge=merge)


def compose_labelled(g0, g1, semiring: LabelSemiring) -> ArcLabelledGraph:
    """Labelled composition (Transform.java:1792): the arc (x, z) exists
    when some y has (x, y) in g0 and (y, z) in g1; its label is the
    semiring ``add`` over all such paths of ``multiply(l0, l1)``."""
    n = max(g0.num_nodes, g1.num_nodes)
    # random access into g1
    g1_succ: Dict[int, Tuple[np.ndarray, List[Label]]] = {}
    for y, succ, labs in g1.iter_labelled():
        if len(succ):
            g1_succ[y] = (succ, labs)
    lists: List[np.ndarray] = []
    labels: List[Label] = []
    it0 = {x: (succ, labs) for x, succ, labs in g0.iter_labelled()
           if len(succ)}
    for x in range(n):
        acc: Dict[int, Label] = {}
        if x in it0:
            succ0, labs0 = it0[x]
            for y, l0 in zip(succ0.tolist(), labs0):
                if y not in g1_succ:
                    continue
                succ1, labs1 = g1_succ[y]
                for z, l1 in zip(succ1.tolist(), labs1):
                    lab = semiring.multiply(l0, l1)
                    acc[z] = (semiring.add(acc[z], lab) if z in acc
                              else lab)
        keys = sorted(acc)
        lists.append(np.asarray(keys, dtype=np.int64))
        labels.extend(acc[k] for k in keys)
    return ArcLabelledGraph(CSRGraph.from_lists(lists), labels, g0.prototype)
