"""Sliced device decode for webgraph-big scale: > 2^31 arcs on one chip.

The lane-per-chunk Pallas kernel (ops/kdecode.py) is int32-indexed inside a
slice; this driver walks a big graph in arc-bounded node slices, rebases
each slice's bit stream to a byte boundary (so in-slice bit offsets fit
int32), plans + runs the kernel per slice with node_base = the slice's
first halo node (successor VALUES are global node ids, which fit int32 for
n < 2^31), and yields flat CSR slices.

Reference chains never cross a slice's halo floor (W * maxRefCount nodes,
BVGraph.java:455/:2258), so each slice plans against a native halo decode
that itself warms up from one extra halo below — the same chain-bound
argument the range decoder documents (wgnative.cpp wg_bv_decode_range).

Graphs with n >= 2^31 NODES decode through the native streaming path
(BVGraph.iter_csr_slices) instead: successor values no longer fit the
kernel's int32 lanes (BVGraphSlowTest.java:30-97 regime).
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import numpy as np

from . import kdecode as K

__all__ = ["decode_big_slices"]


def decode_big_slices(offsets, outdegrees: np.ndarray, settings,
                      data: np.ndarray, slice_arcs: int = 1 << 27,
                      interpret: Optional[bool] = None,
                      **plan_kw) -> Iterator[
                          Tuple[int, int, np.ndarray, np.ndarray]]:
    """Yield (lo, hi, csr_off_local, succ) per arc-balanced node slice.

    ``offsets`` may be an int64 array or an EliasFanoMonotoneList; ``data``
    the full graph bytes (array or memmap).  Total arcs may exceed 2^31;
    node count must stay below 2^31 (see module doc).
    """
    from .. import native as _native
    if not _native.available():
        raise RuntimeError("sliced device decode needs the native library")
    outd = np.asarray(outdegrees, dtype=np.int64)
    n = len(outd)
    if n >= (1 << 31):
        raise ValueError("n >= 2^31: use BVGraph.iter_csr_slices (native "
                         "streaming) — successor values exceed int32 lanes")
    cum = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(outd, out=cum[1:])
    W = settings.window_size
    halo_n = W * max(getattr(settings, "max_ref_count", 3), 1) if W else 0

    lo = 0
    while lo < n:
        hi = int(np.searchsorted(cum, cum[lo] + slice_arcs, side="left"))
        hi = max(min(hi, n), lo + 1)
        lo_p = max(lo - halo_n, 0)
        p2 = max(lo_p - halo_n, 0)
        bit_lo = int(offsets[p2])
        byte0 = bit_lo >> 3
        bitbase = byte0 * 8
        byte1 = (int(offsets[hi]) + 7) >> 3
        data_slice = np.ascontiguousarray(
            np.asarray(data[byte0:byte1 + 8], dtype=np.uint8))
        offs_loc = np.asarray(offsets[lo_p:hi + 1]) - bitbase
        outd_loc = outd[lo_p:hi]

        # native halo decode of [lo_p, hi): ground-truth lists for the
        # planner's per-chunk halo packing (and the hub-lane fill oracle)
        init = np.zeros(W, dtype=np.int64)
        for j in range(W):
            if p2 - 1 - j >= 0:
                init[j] = outd[p2 - 1 - j]
        co_halo, su_halo, _ = _native.bv_decode_range(
            data_slice, settings, p2, lo_p, hi, bit_lo - bitbase, init,
            int(cum[hi] - cum[lo_p]))

        prep = K.plan_kernel_decode(
            offs_loc, outd_loc, settings, data_slice,
            halo_csr=(co_halo, su_halo), refs=None,
            node_base=lo_p, first_node=lo - lo_p, **plan_kw)
        if prep is None:
            # outside the kernel envelope: the native decode IS the slice
            a = int(co_halo[lo - lo_p])
            yield lo, hi, co_halo[lo - lo_p:] - a, su_halo[a:]
        else:
            out, diag = K.decode_chunked(prep, interpret=interpret)
            errs = K.check_diag(prep, np.asarray(diag))
            co, succ = K.chunked_to_csr(prep, np.asarray(out),
                                        data=data_slice, settings=settings,
                                        errs=errs)
            yield lo, hi, co, succ
        lo = hi
