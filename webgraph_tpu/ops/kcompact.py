"""Pallas ragged-compaction kernel: lane-major store -> flat CSR.

The decode kernel's product is a lane-major store (one padded column per
lane-chunk: halo rows, then the chunk's arcs).  Flattening it to CSR is a
PIECEWISE-SHIFT copy — arc k of lane i lives at i*V + halo_i + (k -
arc_start_i) — but XLA can only express it as a general m-element gather,
which executes at ~15 ns/element on this TPU (seconds at uk-2002 scale,
docs/TPU_RUNTIME_NOTES.md).  This kernel exploits the piecewise structure:
each grid program DMAs one contiguous source window into VMEM and emits its
output block segment by segment with dynamic-slice loads + an in-register
sub-lane rotate (pltpu.roll), i.e. memory-bandwidth work instead of random
access.

Layout/semantics:
- out block = OUTROWS x 128 arcs; segments are (start, source) pairs, at
  most SMAX per block (split so no entry spans more than 8 rows' worth of
  output); blocks with more segments fall back to the XLA gather (their
  arc ranges are patched afterwards).
- every segment store covers 8 full rows from the segment's start row;
  values before the segment start inside the first row are blended back
  from the previous segment's store, and rows past the block are absorbed
  by the scratch pad (sequential ascending stores make the final value of
  every position the segment that owns it).
- invalid runs (hub-node chunks, skipped lanes) emit no segments; their
  positions are spliced afterwards (hub assembly / host fill), exactly
  like the gather path.

The reference's analogue of this step simply streams successor arrays off
the iterator (BVGraph.java:1100-1245); here the flatten exists so that
analytics can consume one dense device CSR.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

OUTROWS = 32          # 4096 arcs per grid program
SMAX = 48             # max segments (table entries) per block
FRONT_PAD = 128       # zero elements before the store (keeps r0 >= 0)


def _make_kernel(WR: int):
    SENT = OUTROWS * 128

    def kernel(st_ref, r0_ref, rr_ref, w0_ref, lm_ref, out_ref,
               win, buf, sem):
        dma = pltpu.make_async_copy(
            lm_ref.at[pl.ds(w0_ref[0, 0, 0], WR), :], win, sem)
        dma.start()
        dma.wait()
        colio = lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        row0 = lax.broadcasted_iota(jnp.int32, (8, 128), 0) == 0
        for l in range(SMAX):
            st = st_ref[0, 0, l]

            @pl.when(st < SENT)
            def _():
                r0 = r0_ref[0, 0, l]
                rr = rr_ref[0, 0, l]
                srow = st >> 7
                scol = st & 127
                # 8-aligned 16-row load + sublane rotate (unaligned dynamic
                # sublane slices and negative dynamic roll shifts fault on
                # real hardware)
                r0a = r0 & ~7
                delta = r0 - r0a
                d16 = win[pl.ds(r0a, 16), :]
                d9 = pltpu.roll(d16, 16 - delta, axis=0)[:9]
                r1 = pltpu.roll(d9, 128 - rr, axis=1)
                # bjk[i, c] = window[(r0 + i) * 128 + rr + c]
                bjk = jnp.where(colio < 128 - rr, r1[:8], r1[1:])
                old = buf[pl.ds(srow, 1), :]
                bjk = jnp.where(row0 & (colio < scol), old, bjk)
                buf[pl.ds(srow, 8), :] = bjk

        out_ref[...] = buf[:OUTROWS]

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("NB", "WR", "NR", "interpret"))
def _run_compact(st, r0, rr, w0, lm_pad, *, NB: int, WR: int, NR: int,
                 interpret: bool = False):
    # segment tables ride per-block SMEM windows of the HBM-resident
    # arrays (whole-array scalar prefetch would blow the 1 MB SMEM at web
    # scale; VMEM blocks would need (8,128)-divisible shapes); the window
    # DMA offset comes from the w0 block
    # tables are (NB, 1, SMAX): the blocked trailing dims then EQUAL the
    # array dims, satisfying the Mosaic block-shape rule for any SMAX
    tab = lambda: pl.BlockSpec((1, 1, SMAX), lambda b: (b, 0, 0),  # noqa: E731,E501
                               memory_space=pltpu.SMEM)
    return pl.pallas_call(
        _make_kernel(WR),
        grid=(NB,),
        in_specs=[tab(), tab(), tab(),
                  pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((OUTROWS, 128), lambda b: (b, 0)),
        out_shape=jax.ShapeDtypeStruct((NB * OUTROWS, 128), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((WR, 128), jnp.int32),
            pltpu.VMEM((OUTROWS + 8, 128), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(st.reshape(NB, 1, SMAX), r0.reshape(NB, 1, SMAX),
      rr.reshape(NB, 1, SMAX), w0.reshape(NB, 1, 1),
      lm_pad.reshape(NR, 128))


class CompactPlan:
    """Static tables for the compaction kernel (one per decode plan)."""

    def __init__(self, st, r0, rr, w0, NB, WR, NR, pad_elems, fb_idx,
                 fb_dst):
        self.st, self.r0, self.rr, self.w0 = st, r0, rr, w0
        self.NB, self.WR, self.NR = NB, WR, NR
        self.pad_elems = pad_elems
        self.fb_idx = fb_idx          # fallback gather sources (lane-major)
        self.fb_dst = fb_dst          # fallback CSR positions


def plan_compact(arc_start: np.ndarray, src0: np.ndarray,
                 valid: np.ndarray, m: int, store_elems: int,
                 max_wr: int = 320) -> Optional[CompactPlan]:
    # max_wr bounds EVERY program's window DMA (WR is global): a handful
    # of wide-span blocks (e.g. chunk runs straddling clusters of skipped
    # hub lanes) must not force multi-MB windows on the dense majority —
    # they fall back to the gather instead.  320 rows = 160 KB/program.
    """Build the per-block segment tables.

    ``arc_start``: int64[R+1] ascending CSR positions of each run (last =
    m); ``src0``: int64[R] lane-major source of each run's first arc;
    ``valid``: bool[R] (invalid runs emit no segments — their positions
    are spliced by the caller).  Returns None when the int32 domain is
    exceeded."""
    if m >= (1 << 31) - FRONT_PAD or store_elems + FRONT_PAD >= (1 << 31):
        return None
    R = len(src0)
    NB = -(-m // (OUTROWS * 128)) if m else 1
    SENT = OUTROWS * 128
    store_rows = -(-store_elems // 128)

    # entry boundaries: run starts + the 1024-element grid (so one entry
    # never spans more than 8 output rows)
    grid = np.arange(0, NB * SENT, 1024, dtype=np.int64)
    bnd = np.unique(np.concatenate([arc_start[:-1], grid]))
    bnd = bnd[bnd < m]
    e_run = np.searchsorted(arc_start, bnd, side="right") - 1
    keep = valid[np.clip(e_run, 0, max(R - 1, 0))] & (e_run >= 0)
    bnd = bnd[keep]
    e_run = e_run[keep]
    e_src = src0[e_run] + (bnd - arc_start[e_run])
    blk = bnd // SENT
    st = (bnd % SENT).astype(np.int64)

    # per-block window base.  When the store is big enough the kernel
    # reads it UNPADDED (no per-decode _pad_store copy of the multi-GB
    # store): the window is sized +16 rows so the 8-aligned 16-row
    # segment loads stay inside it even after the end clamp, and the rare
    # entries whose row base would go negative (only the very first lane's
    # first rows) fall back to the gather path.
    srow_src = e_src - (st & 127)        # source of the entry's row base
    neg = srow_src < 0
    srow_ok = np.maximum(srow_src, 0)
    w0 = np.full(NB, np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(w0, blk[~neg], srow_ok[~neg] // 128)
    have = np.zeros(NB, dtype=bool)
    have[blk[~neg]] = True
    w0[~have] = 0

    r0_raw = srow_ok // 128 - w0[blk]
    rr = srow_ok - 128 * (srow_ok // 128)

    # entry index within block + per-block caps
    eib = np.arange(len(blk), dtype=np.int64) - np.searchsorted(
        blk, blk, side="left")
    span_ok_rows = ((r0_raw & ~np.int64(7)) + 16).astype(np.int64)
    blk_rows = np.zeros(NB, dtype=np.int64)
    np.maximum.at(blk_rows, blk[~neg], span_ok_rows[~neg])
    blk_segs = np.bincount(blk, minlength=NB)
    WR = int(min(max(int(blk_rows.max() if len(blk) else 9) + 16, 32),
                 max_wr + 16))
    bad_blk = (blk_rows > max_wr) | (blk_segs > SMAX)
    if neg.any():
        bad_blk[blk[neg]] = True
    if store_rows >= WR:
        # unpadded store: clamp windows into [0, store_rows - WR]
        NR = store_rows
        pad_elems = -1            # marker: no pad pass
        w0 = np.minimum(w0, NR - WR)
        r0 = srow_ok // 128 - w0[blk]
        # clamping may push r0 past SMEM's span budget; those blocks
        # fall back too (only possible at the store tail)
        over = (r0 & ~np.int64(7)) + 16 > WR
        if over.any():
            bad_blk[blk[over]] = True
    else:
        NR = store_rows + WR + 1
        pad_elems = NR * 128 - store_elems
        w0 = np.minimum(np.maximum(w0, 0), max(NR - WR, 0))
        r0 = srow_ok // 128 - w0[blk]
    assert (r0[~bad_blk[blk]] >= 0).all()

    ok = ~bad_blk[blk] & (eib < SMAX)
    st_tab = np.full((NB, SMAX), SENT, dtype=np.int32)
    r0_tab = np.zeros((NB, SMAX), dtype=np.int32)
    rr_tab = np.zeros((NB, SMAX), dtype=np.int32)
    st_tab[blk[ok], eib[ok]] = st[ok]
    r0_tab[blk[ok], eib[ok]] = r0[ok]
    rr_tab[blk[ok], eib[ok]] = rr[ok]

    # fallback arcs: ranges of bad blocks (positions clipped to m)
    fb_idx = fb_dst = None
    if bad_blk.any():
        bb = np.flatnonzero(bad_blk)
        pos = (bb[:, None] * SENT
               + np.arange(SENT, dtype=np.int64)[None, :]).reshape(-1)
        pos = pos[pos < m]
        fb_dst = pos
    return CompactPlan(jnp.asarray(st_tab), jnp.asarray(r0_tab),
                       jnp.asarray(rr_tab),
                       jnp.asarray(w0.astype(np.int32)),
                       NB, WR, NR, pad_elems,
                       fb_idx, fb_dst)


@functools.partial(jax.jit, static_argnames=("front", "tail"))
def _pad_store(lm, front: int, tail: int):
    return jnp.concatenate([jnp.zeros((front,), jnp.int32), lm,
                            jnp.zeros((tail,), jnp.int32)])


def compact(cp: CompactPlan, lm, m: int,
            interpret: Optional[bool] = None):
    """Run the kernel: lane-major flat store -> flat CSR (device int32[m]).
    Fallback-block positions are garbage; the caller splices them (along
    with hub/fill positions)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # pad_elems == -1: the plan reads the store UNPADDED (no multi-GB
    # copy per decode; windows are clamped inside the store and the rare
    # boundary entries ride the gather fallback)
    lm_use = lm if cp.pad_elems == -1 else _pad_store(lm, 0, cp.pad_elems)
    out = _run_compact(cp.st, cp.r0, cp.rr, cp.w0, lm_use,
                       NB=cp.NB, WR=cp.WR, NR=cp.NR, interpret=interpret)
    return out.reshape(-1)[:m]
