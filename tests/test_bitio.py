"""Unit tests for the scalar bit-stream codecs (the L1 oracle).

Strategy mirrors the reference's exhaustive small-parameter sweeps (SURVEY §4):
roundtrip every code over dense small ranges + random 64-bit-ish values, plus
hand-checked golden encodings pinned from the published code definitions.
"""

import random

import pytest

from webgraph_tpu.ops.bitio import (
    BitReader,
    BitWriter,
    CountingBitWriter,
    int2nat,
    nat2int,
)


def bits_of(data: bytes, n: int) -> str:
    return "".join(f"{b:08b}" for b in data)[:n]


def test_write_read_bits_roundtrip():
    rng = random.Random(0)
    vals = [(rng.getrandbits(n), n) for n in range(1, 65) for _ in range(8)]
    w = BitWriter()
    for v, n in vals:
        w.write_bits(v, n)
    r = BitReader(w.to_bytes())
    for v, n in vals:
        assert r.read_bits(n) == v


def test_unary_golden():
    w = BitWriter()
    for x in [0, 1, 2, 7]:
        w.write_unary(x)
    # 1, 01, 001, 00000001
    assert bits_of(w.to_bytes(), w.written_bits) == "1010010" + "0000001"


def test_gamma_golden():
    # gamma: 0->1, 1->010, 2->011, 3->00100, 4->00101, 5->00110, 6->00111
    cases = {0: "1", 1: "010", 2: "011", 3: "00100", 4: "00101", 5: "00110", 6: "00111"}
    for x, code in cases.items():
        w = BitWriter()
        assert w.write_gamma(x) == len(code)
        assert bits_of(w.to_bytes(), w.written_bits) == code
        assert BitReader(w.to_bytes()).read_gamma() == x


def test_delta_golden():
    # delta: 0->1, 1->0100, 2->0101, 3->01100, ...
    cases = {0: "1", 1: "0100", 2: "0101", 3: "01100", 4: "01101"}
    for x, code in cases.items():
        w = BitWriter()
        w.write_delta(x)
        assert bits_of(w.to_bytes(), w.written_bits) == code
        assert BitReader(w.to_bytes()).read_delta() == x


def test_zeta3_golden():
    # zeta_3: x+1 in [1,8) -> h=0: unary(0)=1 then minimal binary over [1,8)
    # z=1..3 -> short codes of 2 bits, z=4..7 -> 3 bits
    w = BitWriter()
    w.write_zeta(0, 3)  # z=1: "1" + 2 bits (z-1=0 < 1? left=1, z-left=0 < 1 -> 2 bits val 0)
    assert bits_of(w.to_bytes(), w.written_bits) == "100"
    for x in range(200):
        w = BitWriter()
        w.write_zeta(x, 3)
        assert BitReader(w.to_bytes()).read_zeta(3) == x, x


@pytest.mark.parametrize("k", [1, 2, 3, 4, 7])
def test_zeta_roundtrip(k):
    rng = random.Random(k)
    vals = list(range(300)) + [rng.getrandbits(b) for b in range(1, 62) for _ in range(4)]
    w = BitWriter()
    for v in vals:
        w.write_zeta(v, k)
    r = BitReader(w.to_bytes())
    for v in vals:
        assert r.read_zeta(k) == v


@pytest.mark.parametrize("b", [1, 2, 3, 5, 8, 100, 1 << 20])
def test_golomb_roundtrip(b):
    rng = random.Random(b)
    vals = list(range(50)) + [rng.randrange(0, 10 * b) for _ in range(100)]
    w = BitWriter()
    for v in vals:
        w.write_golomb(v, b)
    r = BitReader(w.to_bytes())
    for v in vals:
        assert r.read_golomb(v and b or b) == v


def test_minimal_binary_roundtrip():
    for b in [1, 2, 3, 4, 5, 6, 7, 8, 9, 255, 256, 257]:
        w = BitWriter()
        for v in range(b):
            w.write_minimal_binary(v, b)
        r = BitReader(w.to_bytes())
        for v in range(b):
            assert r.read_minimal_binary(b) == v


def test_nibble_golden():
    w = BitWriter()
    w.write_nibble(0)
    assert bits_of(w.to_bytes(), 4) == "1000"
    w = BitWriter()
    w.write_nibble(9)  # 9 = 0b1001 -> groups [1, 001] -> "0001" "1001"
    assert bits_of(w.to_bytes(), 8) == "00011001"
    rng = random.Random(3)
    vals = list(range(100)) + [rng.getrandbits(b) for b in range(1, 62)]
    w = BitWriter()
    for v in vals:
        w.write_nibble(v)
    r = BitReader(w.to_bytes())
    for v in vals:
        assert r.read_nibble() == v


def test_mixed_stream_roundtrip():
    rng = random.Random(42)
    ops = []
    w = BitWriter()
    for _ in range(2000):
        kind = rng.randrange(6)
        v = rng.randrange(0, 1 << rng.randrange(1, 40))
        if kind == 0:
            v = min(v, 1 << 16)
            w.write_unary(v)
        elif kind == 1:
            w.write_gamma(v)
        elif kind == 2:
            w.write_delta(v)
        elif kind == 3:
            w.write_zeta(v, 3)
        elif kind == 4:
            v %= 100000
            w.write_golomb(v, 7)
        else:
            w.write_nibble(v)
        ops.append((kind, v))
    r = BitReader(w.to_bytes())
    readers = [
        lambda: r.read_unary(),
        lambda: r.read_gamma(),
        lambda: r.read_delta(),
        lambda: r.read_zeta(3),
        lambda: r.read_golomb(7),
        lambda: r.read_nibble(),
    ]
    for kind, v in ops:
        assert readers[kind]() == v
    assert r.tell() == w.written_bits


def test_counting_writer_matches():
    rng = random.Random(7)
    w = BitWriter()
    c = CountingBitWriter()
    for _ in range(500):
        v = rng.randrange(0, 1 << 30)
        for m in (w, c):
            m.write_gamma(v)
            m.write_delta(v)
            m.write_zeta(v, 3)
            m.write_golomb(v % 5000, 5)
            m.write_nibble(v)
            m.write_unary(v % 100)
    assert c.written_bits == w.written_bits


def test_int2nat():
    for x, z in [(0, 0), (-1, 1), (1, 2), (-2, 3), (2, 4)]:
        assert int2nat(x) == z
        assert nat2int(z) == x
    for x in [-(1 << 62), (1 << 62), 12345, -12345]:
        assert nat2int(int2nat(x)) == x


def test_position_and_read():
    w = BitWriter()
    for x in range(64):
        w.write_gamma(x)
    data = w.to_bytes()
    r = BitReader(data)
    positions = []
    for x in range(64):
        positions.append(r.tell())
        assert r.read_gamma() == x
    # random access re-reads
    for i in [63, 0, 17, 5, 42]:
        r.position(positions[i])
        assert r.read_gamma() == i
