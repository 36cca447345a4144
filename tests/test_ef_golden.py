"""EFGraph external validation against Java-derived golden bit vectors.

No JVM ships with the reference checkout and cnr-2000 exists only as
BVGraph, so the EF compatibility surface is validated two ways
(VERDICT round-1 item 8):

1. a fully hand-derived literal bit vector for a 4-node graph, worked out
   on paper from EFGraph.java's store semantics (the derivation is inlined
   as comments);
2. an independent transcription of the Java writer's bit discipline
   (LongWordOutputBitStream.append EFGraph.java:294-340, LongWordCache
   append/writeUnary :211-268, Accumulator.init/add/dump :477-532, store
   :773-849) as a bit-list generator, structurally unlike the production
   encoder (codecs/efgraph.py packs numpy word arrays), swept over random
   graphs x quantum values including pointer-producing configs.
"""

import numpy as np
import pytest

from webgraph_tpu.codecs.efgraph import EFGraph
from webgraph_tpu.core.graph import CSRGraph

from .graphs import erdos_renyi


# -- independent generator: literal transcription of the Java semantics -------


def _msb(x: int) -> int:
    return x.bit_length() - 1


def _ceil_log2(x: int) -> int:
    return 0 if x <= 1 else (x - 1).bit_length()


def java_ef_graph_bits(lists, n, upper_bound, log2_quantum):
    """Bit list (LSB-first order, as appended by LongWordOutputBitStream)
    of the whole .graph stream, straight from the Java source."""
    bits = []

    def append(value, width):
        # LongWordOutputBitStream.append(long, int): LSB-first
        for k in range(width):
            bits.append((value >> k) & 1)

    def write_gamma(value):
        # writeNonZeroGamma(value + 1), EFGraph.java:394-406
        v = value + 1
        msb = _msb(v)
        append(1 << msb, msb + 1)
        append(v ^ (1 << msb), msb)

    quantum = 1 << log2_quantum
    for succ in lists:
        outdegree = len(succ)
        write_gamma(outdegree)

        # Accumulator.init (EFGraph.java:477-500): strict=false,
        # indexZeroes=true
        corrected_upper_bound = upper_bound
        corrected_length = outdegree + 1
        l = max(0, _msb(upper_bound // corrected_length)) \
            if corrected_length else 0
        pointer_size = max(0, _ceil_log2(corrected_length
                                         + (upper_bound >> l)))
        lower_mask = (1 << l) - 1

        pointers = []   # (value, width) pairs
        lower = []
        upper = []
        prefix = 0
        cur_len = 0
        last_one = -1

        def add(x):
            nonlocal prefix, cur_len, last_one
            prefix += x
            assert prefix <= corrected_upper_bound
            if l != 0:
                lower.append((prefix & lower_mask, l))
            one_position = (prefix >> l) + cur_len
            # LongWordCache.writeUnary(one_position - last_one - 1):
            # k zeros then a one == append(1 << k, k + 1)
            k = one_position - last_one - 1
            upper.append((1 << k, k + 1))
            zeroes_before = last_one - cur_len + 1
            position = (last_one + (zeroes_before & (-1 << log2_quantum))
                        + quantum - zeroes_before)
            while position < one_position:
                pointers.append((position + 1, pointer_size))
                position += quantum
            last_one = one_position
            cur_len += 1

        last = 0
        for s in succ:
            add(int(s) - last)
            last = int(s)
        # dump(): final fictional pointer = upperBound
        add(corrected_upper_bound - prefix)
        # dump order: pointers, lower bits, upper bits (EFGraph.java:519-532)
        for v, w in pointers:
            append(v, w)
        for v, w in lower:
            append(v, w)
        for v, w in upper:
            append(v, w)
    return bits


def bits_to_le_longwords(bits) -> bytes:
    """Pack the LSB-first bit list into little-endian 64-bit words, as the
    closing flush does (LongWordOutputBitStream.close writes the partial
    buffer as a full long)."""
    nwords = max(1, -(-len(bits) // 64)) if bits else 0
    words = np.zeros(nwords, dtype=np.uint64)
    for i, b in enumerate(bits):
        if b:
            words[i // 64] |= np.uint64(1) << np.uint64(i % 64)
    return words.tobytes()  # numpy default is little-endian on this platform


def store_and_read(lists, tmp_path, log2_quantum=8, upper_bound=None):
    g = CSRGraph.from_lists([np.asarray(s, dtype=np.int64) for s in lists])
    base = str(tmp_path / "ef")
    EFGraph.store(g, base, log2_quantum=log2_quantum,
                  upper_bound=-1 if upper_bound is None else upper_bound)
    return open(base + ".graph", "rb").read()


# -- tests ---------------------------------------------------------------------


def test_ef_golden_hand_derived(tmp_path):
    """4-node example, fully worked by hand from EFGraph.java.

    Graph: 0->[1,2], 1->[], 2->[0,3], 3->[3]; n = upperBound = 4, q = 256.

    node0: gamma(2)=NZgamma(3): unary 2 bits [0,1] + mantissa [1] -> 011.
      acc: len 2, corrLen 3, l=max(0,msb(4//3))=0, no lower bits.
      gaps 1,1; dump adds 4-2=2.
      ones at (1>>0)+0=1, (2>>0)+1=3, (4>>0)+2=6 -> unary gaps 1,1,2
      -> upper [0,1, 0,1, 0,0,1].  7+3=10 bits.
    node1: gamma(0)=NZgamma(1): [1].  corrLen 1, l=msb(4)=2.
      dump adds 4: lower 4&3=0 -> [0,0]; one at (4>>2)+0=1 -> [0,1].
    node2: gamma(2) [0,1,1]; l=0; gaps 0,3; dump 1.
      ones at 0, 3+1=4, 4+2=6 -> unary gaps 0,3,1 -> [1, 0,0,0,1, 0,1].
    node3: gamma(1)=NZgamma(2): [0,1] + [0].  corrLen 2, l=msb(2)=1.
      gap 3: lower 3&1=1, one at (3>>1)+0=1 -> [0,1]; dump 1: prefix 4,
      lower 0, one at (4>>1)+1=3 -> gap 1 -> [0,1].
      lower [1,0] then upper [0,1,0,1].
    """
    expected_bits = (
        [0, 1, 1] + [0, 1, 0, 1, 0, 0, 1]            # node 0
        + [1] + [0, 0] + [0, 1]                       # node 1
        + [0, 1, 1] + [1, 0, 0, 0, 1, 0, 1]           # node 2
        + [0, 1, 0] + [1, 0] + [0, 1, 0, 1]           # node 3
    )
    lists = [[1, 2], [], [0, 3], [3]]
    got = store_and_read(lists, tmp_path, log2_quantum=8)
    assert got == bits_to_le_longwords(expected_bits)
    # and the generator agrees with the hand derivation
    gen = java_ef_graph_bits(lists, 4, 4, 8)
    assert gen == expected_bits


@pytest.mark.parametrize("log2q", [2, 4, 8])
@pytest.mark.parametrize("seed", [0, 1])
def test_ef_golden_sweep(tmp_path, log2q, seed):
    """Byte-for-byte equality with the Java-semantics generator over random
    graphs; log2q=2 produces skip pointers in most lists."""
    g = erdos_renyi(70, 0.2, seed=seed)
    lists = [g.successors(x).tolist() for x in range(g.num_nodes)]
    got = store_and_read(lists, tmp_path, log2_quantum=log2q)
    exp = bits_to_le_longwords(
        java_ef_graph_bits(lists, g.num_nodes, g.num_nodes, log2q))
    assert got == exp


def test_ef_golden_upper_bound_and_dense(tmp_path):
    """Non-default upperBound and a dense row (l = 0, long unary runs)."""
    lists = [[0, 1, 2, 3, 4, 5, 6, 7], [9], []]
    got = store_and_read(lists, tmp_path, log2_quantum=4, upper_bound=10)
    exp = bits_to_le_longwords(java_ef_graph_bits(lists, 3, 10, 4))
    assert got == exp


def test_ef_golden_roundtrip_after_golden(tmp_path):
    """The golden-validated bytes reload to the original graph."""
    g = erdos_renyi(50, 0.15, seed=7)
    base = str(tmp_path / "ef")
    EFGraph.store(g, base, log2_quantum=2)
    loaded = EFGraph.load(base)
    for x in range(g.num_nodes):
        np.testing.assert_array_equal(loaded.successors(x), g.successors(x))
