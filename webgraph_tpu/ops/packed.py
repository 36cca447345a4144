"""Packed bitstream representation for device kernels.

The BVGraph stream is MSB-first within bytes (bitio.py).  On device we hold
it as big-endian-packed uint32 words: stream bit i lives at bit
(31 - i % 32) of word i // 32.  All vectorized decoders index this array.
"""

from __future__ import annotations

import numpy as np

__all__ = ["pack_words_u32", "decode_offset_stream"]


def pack_words_u32(data) -> np.ndarray:
    """uint8 MSB-first byte stream -> uint32 big-endian word array.

    Pads with 16 extra zero words so vector readers may over-read safely.
    """
    buf = np.asarray(data, dtype=np.uint8)
    pad = (-len(buf)) % 4
    if pad:
        buf = np.concatenate([buf, np.zeros(pad, dtype=np.uint8)])
    words = buf.view(">u4").astype(np.uint32)
    return np.concatenate([words, np.zeros(16, dtype=np.uint32)])


def decode_offset_stream(raw: np.ndarray, n: int, read_one) -> np.ndarray:
    """Decode an (n+1)-entry gap stream into absolute bit offsets.

    ``read_one`` is a callable taking a BitReader (e.g. settings.read_offset).
    Scalar host path; the C++ native reader replaces this for big graphs.
    """
    from .bitio import BitReader

    r = BitReader(raw)
    out = np.empty(n + 1, dtype=np.int64)
    acc = 0
    for i in range(n + 1):
        acc += read_one(r)
        out[i] = acc
    return out
