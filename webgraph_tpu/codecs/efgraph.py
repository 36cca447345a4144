"""EFGraph — Elias–Fano successor-list codec.

From-scratch implementation of the EFGraph format (reference EFGraph.java:
format parameters :140-168, Accumulator :416-540, store :773-849,
LongWordBitReader :852-990, EliasFanoSuccessorReader :1017-1166).

Per node the stream (LSB-first longwords, ops.longword) holds:

1. gamma-coded outdegree d;
2. skip pointers: numberOfPointers(d+1, u, q) entries of pointerSize(d+1, u)
   bits; pointer j is 1 + the (region-relative) position of the (j*2^q)-th
   zero of the upper-bits array;
3. lower bits: (d+1) * l bits, l = max(0, floor(log2(u / (d+1))));
4. upper bits: unary-coded gaps of "one positions"; the i-th one sits at
   position (v_i >> l) + i where v_i is the i-th successor; a sentinel
   value u (the upper bound) terminates every list.

The offsets file is a delta-coded gap stream (n+1 entries, leading 0) in the
MSB-first discipline of BVGraph offsets.  Properties: nodes/arcs/upperbound/
quantum/byteorder/version (EFGraph.java:686-698).

This module is the scalar oracle + host file layer; the vectorized device
decoder lives in webgraph_tpu.ops.efdecode (select-by-cumsum over expanded
upper-bit regions — fully parallel, no state machine).
"""

from __future__ import annotations

import math
import os
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from ..core.graph import CSRGraph, ImmutableGraph, register_graph_class
from ..ops.bitio import BitReader, BitWriter
from ..ops.longword import LongWordReader, LongWordWriter
from ..utils import properties as javaprops

__all__ = ["EFGraph"]

GRAPH_EXTENSION = ".graph"
OFFSETS_EXTENSION = ".offsets"
PROPERTIES_EXTENSION = ".properties"
EFGRAPH_VERSION = 0
DEFAULT_LOG2_QUANTUM = 8


def lower_bits(length: int, upper_bound: int) -> int:
    """l = max(0, floor(log2(u/length))) (EFGraph.java:140-142)."""
    if length == 0:
        return 0
    q = upper_bound // length
    return max(0, q.bit_length() - 1)


def _ceil_log2(x: int) -> int:
    return (x - 1).bit_length() if x > 0 else 0


def pointer_size(length: int, upper_bound: int) -> int:
    return max(0, _ceil_log2(length + (upper_bound >> lower_bits(length, upper_bound))))


def number_of_pointers(length: int, upper_bound: int, log2_quantum: int) -> int:
    if length == 0:
        return 0
    return (upper_bound >> lower_bits(length, upper_bound)) >> log2_quantum


class _Accumulator:
    """Per-list Elias–Fano accumulator (EFGraph.java:416-540 semantics)."""

    def __init__(self, log2_quantum: int):
        self.log2_quantum = log2_quantum

    def init(self, length: int, upper_bound: int):
        self.length = length
        self.quantum = 1 << self.log2_quantum
        self.corrected_upper_bound = upper_bound
        corrected_length = length + 1  # with the final sentinel
        self.current_prefix_sum = 0
        self.current_length = 0
        self.last_one_position = -1
        self.l = lower_bits(corrected_length, upper_bound)
        self.pointer_size = pointer_size(corrected_length, upper_bound)
        self.expected_pointers = number_of_pointers(
            corrected_length, upper_bound, self.log2_quantum)
        self.lower: List[Tuple[int, int]] = []     # (value, width)
        self.upper: List[int] = []                 # unary gap values
        self.pointers: List[int] = []

    def add(self, gap: int) -> None:
        if self.current_length != 0 and gap == 0:
            raise ValueError("duplicate successor")
        self.current_prefix_sum += gap
        if self.current_prefix_sum > self.corrected_upper_bound:
            raise ValueError("prefix sum exceeds upper bound")
        if self.l != 0:
            self.lower.append(
                (self.current_prefix_sum & ((1 << self.l) - 1), self.l))
        one_position = (self.current_prefix_sum >> self.l) + self.current_length
        self.upper.append(one_position - self.last_one_position - 1)
        zeroes_before = self.last_one_position - self.current_length + 1
        position = (self.last_one_position
                    + (zeroes_before & -(1 << self.log2_quantum))
                    + self.quantum - zeroes_before)
        while position < one_position:
            self.pointers.append(position + 1)
            position += self.quantum
        self.last_one_position = one_position
        self.current_length += 1

    def dump(self, writer: LongWordWriter) -> int:
        if self.current_length != self.length:
            raise RuntimeError("list length mismatch")
        self.add(self.corrected_upper_bound - self.current_prefix_sum)
        assert self.pointer_size == 0 or len(self.pointers) == self.expected_pointers, \
            (len(self.pointers), self.expected_pointers)
        start = writer.written_bits
        if self.pointer_size > 0:
            for p in self.pointers:
                writer.append(p, self.pointer_size)
        for v, w in self.lower:
            writer.append(v, w)
        for gap in self.upper:
            writer.write_unary(gap)
        return writer.written_bits - start


@register_graph_class(
    "it.unimi.dsi.big.webgraph.EFGraph",
    "it.unimi.dsi.webgraph.EFGraph",
)
class EFGraph(ImmutableGraph):
    """An EFGraph loaded from ``basename.graph``+``.offsets``+``.properties``."""

    def __init__(self, words: np.ndarray, n: int, m: int, upper_bound: int,
                 log2_quantum: int, offsets: Optional[np.ndarray] = None,
                 properties: Optional[Dict[str, str]] = None,
                 basename: Optional[str] = None):
        self.words = words
        self._n = n
        self._m = m
        self.upper_bound = upper_bound
        self.log2_quantum = log2_quantum
        self.offsets = offsets
        self.properties = properties or {}
        self.basename = basename

    # -- loading ----------------------------------------------------------

    @classmethod
    def load(cls, basename: str, mode: str = "standard") -> "EFGraph":
        props = javaprops.load(basename + PROPERTIES_EXTENSION)
        if int(props.get("version", "0")) > EFGRAPH_VERSION:
            raise IOError("unsupported EFGraph version")
        n = int(props["nodes"])
        m = int(props["arcs"])
        upper_bound = int(props.get("upperbound", n))
        quantum = int(props.get("quantum", 1 << DEFAULT_LOG2_QUANTUM))
        log2_quantum = quantum.bit_length() - 1
        byteorder = props.get("byteorder", "LITTLE_ENDIAN")
        dt = "<u8" if "LITTLE" in byteorder else ">u8"
        raw = np.fromfile(basename + GRAPH_EXTENSION, dtype=np.uint8)
        pad = (-len(raw)) % 8
        if pad:
            raw = np.concatenate([raw, np.zeros(pad, np.uint8)])
        words = raw.view(dt).astype(np.uint64)
        g = cls(words, n, m, upper_bound, log2_quantum, properties=props,
                basename=basename)
        if mode not in ("offline", "once", "sequential"):
            g.offsets = g._load_offsets(basename)
        return g

    def _load_offsets(self, basename: str) -> np.ndarray:
        raw = np.fromfile(basename + OFFSETS_EXTENSION, dtype=np.uint8)
        r = BitReader(raw)
        out = np.empty(self._n + 1, dtype=np.int64)
        acc = 0
        for i in range(self._n + 1):
            acc += r.read_delta()
            out[i] = acc
        return out

    # -- core contract ----------------------------------------------------

    @property
    def num_nodes(self) -> int:
        return self._n

    @property
    def num_arcs(self) -> int:
        return self._m

    def _entry_params(self, d: int):
        cl = d + 1
        l = lower_bits(cl, self.upper_bound)
        psize = pointer_size(cl, self.upper_bound)
        npointers = number_of_pointers(cl, self.upper_bound, self.log2_quantum)
        return cl, l, psize, npointers

    def _reader_at(self, x: int) -> Tuple[LongWordReader, int, int, int, int, int]:
        """Position a reader; return (reader, d, l, ptr_base, low_base, up_base)."""
        r = LongWordReader(self.words)
        r.position(int(self.offsets[x]))
        d = r.read_gamma()
        cl, l, psize, npointers = self._entry_params(d)
        ptr_base = r.tell()
        low_base = ptr_base + npointers * psize
        up_base = low_base + cl * l
        return r, d, l, ptr_base, low_base, up_base

    def outdegree(self, x: int) -> int:
        r = LongWordReader(self.words)
        r.position(int(self.offsets[x]))
        return r.read_gamma()

    def successors(self, x: int) -> np.ndarray:
        r, d, l, _, low_base, up_base = self._reader_at(x)
        out = np.empty(d, dtype=np.int64)
        # read the d ones of the upper-bits array (the d+1-th is the sentinel)
        r.position(up_base)
        one_pos = -1
        lowr = LongWordReader(self.words)
        for i in range(d):
            one_pos += r.read_unary() + 1
            upper = one_pos - i
            if l:
                lowr.position(low_base + i * l)
                out[i] = (upper << l) | lowr.extract(l)
            else:
                out[i] = upper
        return out

    def successors_from(self, x: int, lower_bound: int) -> np.ndarray:
        """All successors >= lower_bound (the skipTo access path,
        EFGraph.java:1098-1160: a skip pointer jumps over quantum-sized zero
        runs, then a linear one-scan finishes)."""
        r, d, l, ptr_base, low_base, up_base = self._reader_at(x)
        if d == 0:
            return np.zeros(0, dtype=np.int64)
        zeroes_to_skip = max(0, lower_bound) >> l
        start_rel = 0       # resume position within the upper-bits region
        i = 0               # ones before start_rel
        p = zeroes_to_skip >> self.log2_quantum
        if p > 0:
            cl, _, psize, npointers = self._entry_params(d)
            p = min(p, npointers)
            if psize and p > 0:
                pr = LongWordReader(self.words)
                pr.position(ptr_base + (p - 1) * psize)
                pos = pr.extract(psize) - 1  # position of the (p<<q)-th zero
                start_rel = pos + 1
                i = start_rel - (p << self.log2_quantum)  # ones before it
        r.position(up_base + start_rel)
        lowr = LongWordReader(self.words)
        vals: List[int] = []
        emitting = False
        while i < d:
            r.read_unary()
            one_rel = (r.tell() - up_base) - 1
            upper = one_rel - i
            if l:
                lowr.position(low_base + i * l)
                v = (upper << l) | lowr.extract(l)
            else:
                v = upper
            if emitting or v >= lower_bound:
                emitting = True
                vals.append(v)
            i += 1
        return np.asarray(vals, dtype=np.int64)

    def iter_nodes(self, start: int = 0) -> Iterator[Tuple[int, np.ndarray]]:
        if self.offsets is not None:
            for x in range(start, self._n):
                yield x, self.successors(x)
            return
        # sequential scan without offsets
        r = LongWordReader(self.words)
        r.position(0)
        for x in range(self._n):
            d = r.read_gamma()
            cl, l, psize, npointers = self._entry_params(d)
            base = r.tell()
            low_base = base + npointers * psize
            up_base = low_base + cl * l
            succ = np.empty(d, dtype=np.int64)
            rr = LongWordReader(self.words)
            rr.position(up_base)
            one_pos = -1
            lowr = LongWordReader(self.words)
            last_one = -1
            for i in range(cl):
                one_pos += rr.read_unary() + 1
                if i < d:
                    upper = one_pos - i
                    if l:
                        lowr.position(low_base + i * l)
                        succ[i] = (upper << l) | lowr.extract(l)
                    else:
                        succ[i] = upper
            r.position(rr.tell())
            if x >= start:
                yield x, succ

    # -- encoding ---------------------------------------------------------

    @classmethod
    def store(cls, graph: ImmutableGraph, basename: str,
              upper_bound: int = -1, log2_quantum: int = DEFAULT_LOG2_QUANTUM,
              byte_order: str = "little",
              comment: str = "EFGraph properties") -> Dict[str, str]:
        n = graph.num_nodes
        if upper_bound < 0:
            upper_bound = n
        acc = _Accumulator(log2_quantum)
        w = LongWordWriter()
        offsets_w = BitWriter()
        offsets_w.write_delta(0)
        m = 0
        bits_for_outdegrees = 0
        bits_for_successors = 0
        for x, succ in graph.iter_nodes():
            d = len(succ)
            m += d
            entry_start = w.written_bits
            bits_for_outdegrees += w.write_gamma(d)
            acc.init(d, upper_bound)
            last = 0
            for s in succ.tolist():
                acc.add(s - last)
                last = s
            bits_for_successors += acc.dump(w)
            offsets_w.write_delta(w.written_bits - entry_start)
        with open(basename + GRAPH_EXTENSION, "wb") as f:
            f.write(w.to_bytes(byte_order))
        with open(basename + OFFSETS_EXTENSION, "wb") as f:
            f.write(offsets_w.to_bytes())
        written_bits = os.path.getsize(basename + GRAPH_EXTENSION) * 8

        def fmt(v):
            s = f"{v:.3f}".rstrip("0").rstrip(".")
            return s or "0"

        props: Dict[str, str] = {"nodes": str(n), "arcs": str(m)}
        if upper_bound != n:
            props["upperbound"] = str(upper_bound)
        props["quantum"] = str(1 << log2_quantum)
        props["byteorder"] = ("LITTLE_ENDIAN" if byte_order == "little"
                              else "BIG_ENDIAN")
        props["bitsperlink"] = fmt(written_bits / m) if m else "0"
        props["bitspernode"] = fmt(written_bits / n) if n else "0"
        props["avgbitsforoutdegrees"] = fmt(bits_for_outdegrees / n) if n else "0"
        props["bitsforoutdegrees"] = str(bits_for_outdegrees)
        props["bitsforsuccessors"] = str(bits_for_successors)
        props["graphclass"] = "it.unimi.dsi.big.webgraph.EFGraph"
        props["version"] = str(EFGRAPH_VERSION)
        javaprops.dump(props, basename + PROPERTIES_EXTENSION, comment)
        return props
