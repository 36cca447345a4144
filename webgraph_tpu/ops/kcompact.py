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
SMAX = 256            # max segments (table entries) per block
FRONT_PAD = 128       # zero elements before the store (keeps r0 >= 0)


def _make_kernel(WRA: int, WRB: int):
    def kernel(st_ref, r0_ref, rr_ref, w0_ref, lm_ref, out_ref,
               win, buf, sem, semb):
        dma = pltpu.make_async_copy(
            lm_ref.at[pl.ds(w0_ref[0, 0, 0], WRA), :], win.at[:WRA], sem)
        dma.start()
        if WRB:
            useb = w0_ref[0, 0, 3] > 0

            @pl.when(useb)
            def _():
                pltpu.make_async_copy(
                    lm_ref.at[pl.ds(w0_ref[0, 0, 1], WRB), :],
                    win.at[WRA:], semb).start()
        dma.wait()
        if WRB:
            @pl.when(useb)
            def _():
                pltpu.make_async_copy(
                    lm_ref.at[pl.ds(w0_ref[0, 0, 1], WRB), :],
                    win.at[WRA:], semb).wait()
        colio = lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        row0 = lax.broadcasted_iota(jnp.int32, (8, 128), 0) == 0

        # dynamic segment loop over the block's ACTUAL entry count (from
        # SMEM): blocks pay only for the segments they use, so SMAX can be
        # large enough for hub-run-dense blocks (short piecewise runs)
        # without unrolled-code blowup
        def seg(l, _):
            st = st_ref[0, 0, l]
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
            return 0

        import os as _os
        if _os.environ.get("WG_COMPACT_UNROLL"):  # diagnostic
            nseg = w0_ref[0, 0, 2]
            for l in range(SMAX):
                @pl.when(l < nseg)
                def _(l=l):
                    seg(l, 0)
        else:
            lax.fori_loop(0, w0_ref[0, 0, 2], seg, 0)
        out_ref[...] = buf[:OUTROWS]

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("NB", "WRA", "WRB", "NR", "interpret"))
def _run_compact(st, r0, rr, w0, lm_pad, *, NB: int, WRA: int, WRB: int,
                 NR: int, interpret: bool = False):
    # segment tables ride per-block SMEM windows of the HBM-resident
    # arrays (whole-array scalar prefetch would blow the 1 MB SMEM at web
    # scale; VMEM blocks would need (8,128)-divisible shapes); the window
    # DMA offsets come from the w0 block
    # tables are (NB, 1, SMAX): the blocked trailing dims then EQUAL the
    # array dims, satisfying the Mosaic block-shape rule for any SMAX
    tab = lambda: pl.BlockSpec((1, 1, SMAX), lambda b: (b, 0, 0),  # noqa: E731,E501
                               memory_space=pltpu.SMEM)
    return pl.pallas_call(
        _make_kernel(WRA, WRB),
        grid=(NB,),
        in_specs=[tab(), tab(), tab(),
                  pl.BlockSpec((1, 1, 4), lambda b: (b, 0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((OUTROWS, 128), lambda b: (b, 0)),
        out_shape=jax.ShapeDtypeStruct((NB * OUTROWS, 128), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((WRA + WRB, 128), jnp.int32),
            pltpu.VMEM((OUTROWS + 8, 128), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(st.reshape(NB, 1, SMAX), r0.reshape(NB, 1, SMAX),
      rr.reshape(NB, 1, SMAX), w0.reshape(NB, 1, 4),
      lm_pad.reshape(NR, 128))


class CompactPlan:
    """Static tables for the compaction kernel (one per decode plan)."""

    def __init__(self, st, r0, rr, w0, NB, WRA, WRB, NR, pad_elems,
                 fb_idx, fb_dst):
        self.st, self.r0, self.rr, self.w0 = st, r0, rr, w0
        self.NB, self.WRA, self.WRB, self.NR = NB, WRA, WRB, NR
        self.pad_elems = pad_elems
        self.fb_idx = fb_idx          # fallback gather sources (lane-major)
        self.fb_dst = fb_dst          # fallback CSR positions
        self.has_hub = False          # hub runs merged into the tables
        self.int_dst = None           # static interval hub arcs (sorted)
        self.int_val = None


def plan_compact(arc_start: np.ndarray, src0: np.ndarray,
                 valid: np.ndarray, m: int, store_elems: int,
                 max_wr: int = 320,
                 hub_runs: Optional[tuple] = None) -> Optional[CompactPlan]:
    # max_wr bounds EVERY program's window DMA (WR is global): a handful
    # of wide-span blocks (e.g. chunk runs straddling clusters of skipped
    # hub lanes) must not force multi-MB windows on the dense majority —
    # they fall back to the gather instead.  320 rows = 160 KB/program.
    """Build the per-block segment tables.

    ``arc_start``: int64[R+1] ascending CSR positions of each run (last =
    m); ``src0``: int64[R] lane-major source of each run's first arc;
    ``valid``: bool[R] (invalid runs emit no segments — their positions
    are spliced by the caller).  ``hub_runs``: optional (dst0, hsrc0)
    piecewise runs tiling the hub-node gaps (sources may point past the
    store into an appended static-value tail counted in ``store_elems``) —
    they merge into the same segment tables, so hub arcs land in the SAME
    kernel pass as chunk arcs.  Returns None when the int32 domain is
    exceeded."""
    if m >= (1 << 31) - FRONT_PAD or store_elems + FRONT_PAD >= (1 << 31):
        return None
    if hub_runs is not None:
        hd, hs = hub_runs
        # stable order with hub entries AFTER chunk entries at equal
        # start: the invalid hub-chunk run collapses to zero length and
        # searchsorted(..., "right") picks the hub run at its boundary.
        # Runs whose source lies past the store (static interval values)
        # stay invalid — the caller splices those positions afterwards.
        S = np.concatenate([arc_start[:-1], hd])
        order = np.argsort(S, kind="stable")
        arc_start = np.concatenate([S[order], [m]])
        src0 = np.concatenate([src0, hs])[order]
        valid = np.concatenate([valid, hs < store_elems])[order]
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

    # per-block DOUBLE window.  A block's segment sources can cluster in
    # two distant store regions (chunk/copy sources near the block's own
    # lanes vs hub residual segments in the preset-lane region at the end
    # of the store), so each block gets TWO DMA windows: entries encode
    # r0 relative to window A, or offset past WRA into window B.  When
    # the store is big enough the kernel reads it UNPADDED; entries whose
    # row base would go negative fall back to the gather path.
    srow_src = e_src - (st & 127)        # source of the entry's row base
    neg = srow_src < 0
    srow_ok = np.maximum(srow_src, 0)
    row = srow_ok // 128
    rr = (srow_ok - 128 * row).astype(np.int64)

    w0a = np.full(NB, np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(w0a, blk[~neg], row[~neg])
    have = np.zeros(NB, dtype=bool)
    have[blk[~neg]] = True
    w0a[~have] = 0
    span_a = ((row - w0a[blk]) & ~np.int64(7)) + 16
    in_a = ~neg & (span_a <= max_wr)

    import os as _os
    _one_win = bool(_os.environ.get("WG_COMPACT_1WIN"))
    in_b = ~neg & ~in_a
    if _one_win:    # diagnostic: no window B, b-entries fall back
        in_b[:] = False
    w0b = np.full(NB, np.iinfo(np.int64).max, dtype=np.int64)
    if in_b.any():
        np.minimum.at(w0b, blk[in_b], row[in_b])
    haveb = np.zeros(NB, dtype=bool)
    haveb[blk[in_b]] = True
    w0b[~haveb] = 0
    span_b = ((row - w0b[blk]) & ~np.int64(7)) + 16
    bad_entry = neg | (in_b & (span_b > max_wr)) \
        | (_one_win & ~neg & ~in_a)

    # entry index within block + per-block caps
    eib = np.arange(len(blk), dtype=np.int64) - np.searchsorted(
        blk, blk, side="left")
    blk_segs = np.bincount(blk, minlength=NB)
    bad_blk = blk_segs > SMAX
    if bad_entry.any():
        bad_blk[blk[bad_entry]] = True
    WRA = int(min(max(int(span_a[in_a].max()) if in_a.any() else 32, 32),
                  max_wr + 16))
    WRB = (int(min(int(span_b[in_b & ~bad_entry].max()), max_wr + 16))
           if (in_b & ~bad_entry).any() else 0)
    WR = WRA + WRB
    if store_rows >= WR:
        # unpadded store: clamp windows so they end inside it
        NR = store_rows
        pad_elems = -1            # marker: no pad pass
        w0a = np.minimum(w0a, NR - WRA)
        w0b = np.minimum(w0b, NR - max(WRB, 1))
    else:
        NR = store_rows + WR + 1
        pad_elems = NR * 128 - store_elems
        w0a = np.minimum(np.maximum(w0a, 0), max(NR - WRA, 0))
        w0b = np.minimum(np.maximum(w0b, 0), max(NR - max(WRB, 1), 0))
    # clamping may push an entry past its window span; those blocks fall
    # back too (only possible at the store tail)
    r0 = np.where(in_a, row - w0a[blk], WRA + (row - w0b[blk]))
    over = (~bad_entry
            & (((r0 & ~np.int64(7)) + 16 > np.where(in_a, WRA, WR))
               | (r0 < np.where(in_a, 0, WRA))))
    if over.any():
        bad_blk[blk[over]] = True
    assert (r0[~bad_blk[blk] & ~bad_entry] >= 0).all()

    ok = ~bad_blk[blk] & (eib < SMAX)
    st_tab = np.full((NB, SMAX), SENT, dtype=np.int32)
    r0_tab = np.zeros((NB, SMAX), dtype=np.int32)
    rr_tab = np.zeros((NB, SMAX), dtype=np.int32)
    st_tab[blk[ok], eib[ok]] = st[ok]
    r0_tab[blk[ok], eib[ok]] = r0[ok]
    rr_tab[blk[ok], eib[ok]] = rr[ok]
    # w0 table rides (winA base, winB base, live segment count, B-entry
    # count) per block: the kernel's dynamic segment loop runs exactly
    # nseg iterations, and the window-B DMA is skipped when nsegb == 0
    nseg = np.bincount(blk[ok], minlength=NB).astype(np.int64)
    nsegb = np.bincount(blk[ok & in_b], minlength=NB).astype(np.int64)
    w0_tab = np.stack([w0a, w0b, nseg, nsegb], axis=1).astype(np.int32)

    # fallback arcs: ranges of bad blocks (positions clipped to m), mapped
    # through the (merged) run table to their gather sources; positions in
    # invalid runs get source 0 — their values are spliced by the caller
    fb_idx = fb_dst = None
    if bad_blk.any():
        bb = np.flatnonzero(bad_blk)
        pos = (bb[:, None] * SENT
               + np.arange(SENT, dtype=np.int64)[None, :]).reshape(-1)
        pos = pos[pos < m]
        fb_dst = pos
        r_of = np.clip(np.searchsorted(arc_start, pos, side="right") - 1,
                       0, max(R - 1, 0))
        fb_idx = src0[r_of] + (pos - arc_start[r_of])
    return CompactPlan(jnp.asarray(st_tab), jnp.asarray(r0_tab),
                       jnp.asarray(rr_tab), jnp.asarray(w0_tab),
                       NB, WRA, WRB, NR, pad_elems,
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
                       NB=cp.NB, WRA=cp.WRA, WRB=cp.WRB, NR=cp.NR,
                       interpret=interpret)
    return out.reshape(-1)[:m]
