"""Vectorized BVGraph encoder (XLA ops, device-resident).

The TPU-native encode path (SURVEY §7 step 5; reference semantics
CompressionThread.call + diffComp, BVGraph.java:1977-2328).  The reference
encodes one node at a time: greedy reference selection sizes every window
candidate with a counting bit stream (:2256-2270), the winner's diff is
written with measure-then-write discipline (:2259/:2270).  Here the same
computation is re-shaped into four array passes:

1. **membership masks** — for every arc (x, v) and every r in 1..W, does
   the arc (x-r, v) / (x+r, v) exist?  One lexicographic device sort of
   (value, node) puts all arcs sharing a value next to each other; W static
   shifted compares then recover both mask directions with no gathers
   inside loops and no searchsorted (the runtime's pathological shapes,
   docs/TPU_RUNTIME_NOTES.md).
2. **candidate cost matrix** — copy blocks are the run-length encoding of
   the ref-list membership mask minus its trailing run (two-pointer walk
   BVGraph.java:1996-2051 == RLE over "ref element is in curr list");
   intervals/residuals of the leftover are segmented-scan run detection
   (intervalize :1595-1618).  All (x, r) costs in parallel as closed-form
   code lengths.
3. **greedy selection** — the only sequential step (ref_count chains couple
   consecutive nodes); runs in the native layer over the cost matrix
   (wg_select_refs, exactly :2256-2270 semantics).
4. **packing** — winner tokens (value, code, length) land in a statically
   laid-out slot array; an exclusive scan of lengths gives every token's
   bit position; each token scatters into <= 3 big-endian 32-bit words
   (measure-then-pack, the reference's own two-pass proof of equivalence).

Byte-identical to the scalar oracle (codecs/bvgraph._Encoder), which is
byte-identical to the Java reference on cnr-2000.

64-bit code words require x64 tracing: all entry points trace under
``jax.enable_x64(True)``; large index arrays stay int32.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..codecs.bvgraph import CompressionFlags as _C

__all__ = ["encode_chunk", "cost_matrix", "member_masks", "select_refs",
           "supported"]

_I32 = jnp.int32
_I64 = jnp.int64
_U64 = jnp.uint64


def supported(settings) -> bool:
    """Codes the vectorized encoder can pack (the defaults and every
    config in the reference's compression sweep; Golomb/nibble residuals
    fall back to the scalar/native encoders)."""
    gd = (_C.GAMMA, _C.DELTA)
    return (settings.outdegree_coding in gd
            and settings.reference_coding in (_C.UNARY, _C.GAMMA, _C.DELTA)
            and settings.block_count_coding in (_C.UNARY, _C.GAMMA, _C.DELTA)
            and settings.block_coding in (_C.UNARY, _C.GAMMA, _C.DELTA)
            and settings.residual_coding in (_C.ZETA, _C.GAMMA, _C.DELTA)
            and settings.offset_coding in gd
            and 0 <= settings.window_size <= 7)


# ---------------------------------------------------------------------------
# closed-form instantaneous codes: value -> (bits uint64, length int32)
# (MSB-first stream; bit patterns per ops/bitio.py write_* semantics)
# ---------------------------------------------------------------------------


def _msb64(z):
    """floor(log2(z)) for z >= 1 (int64)."""
    return 63 - jax.lax.clz(z.astype(_I64))


def _gamma(x):
    z = x.astype(_I64) + 1
    b = _msb64(z)
    return z.astype(_U64), (2 * b + 1).astype(_I32)


def _delta(x):
    z = x.astype(_I64) + 1
    b = _msb64(z)
    zb = (b + 1).astype(_I64)
    bb = _msb64(zb)
    bits = (zb.astype(_U64) << b.astype(_U64)) | (z - (_one64() << b)
                                                  ).astype(_U64)
    return bits, (2 * bb + 1 + b).astype(_I32)


def _unary(x):
    return jnp.ones_like(x, dtype=_U64), (x + 1).astype(_I32)


def _one64():
    return jnp.asarray(1, dtype=_I64)


def _zeta(x, k: int):
    z = x.astype(_I64) + 1
    h = _msb64(z) // k
    hk = h * k
    left = _one64() << hk
    short = z < (left << 1)
    w = jnp.where(short, hk + k - 1, hk + k)
    field = jnp.where(short, z - left, z)
    bits = (_one64().astype(_U64) << w.astype(_U64)) | field.astype(_U64)
    return bits, (h + 1 + w).astype(_I32)


def _code(kind: int, x, zeta_k: int = 3):
    if kind == _C.GAMMA:
        return _gamma(x)
    if kind == _C.DELTA:
        return _delta(x)
    if kind == _C.UNARY:
        return _unary(x)
    if kind == _C.ZETA:
        return _zeta(x, zeta_k)
    raise NotImplementedError(kind)


def _code_len(kind: int, x, zeta_k: int = 3):
    return _code(kind, x, zeta_k)[1]


def _int2nat(x):
    return (x << 1) ^ (x >> 63) if x.dtype == _I64 else \
        ((x.astype(_I64) << 1) ^ (x.astype(_I64) >> 63))


# ---------------------------------------------------------------------------
# membership masks
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("W",))
def _member_masks_dev(seg, val, W: int):
    m = seg.shape[0]
    idx = jnp.arange(m, dtype=_I32)
    sv, sx, si = jax.lax.sort([val, seg, idx], num_keys=2)
    down = jnp.zeros(m, dtype=_I32)
    up = jnp.zeros(m, dtype=_I32)
    for s in range(1, W + 1):
        if s >= m:
            break
        pv = jnp.concatenate([jnp.full(s, -1, _I32), sv[:-s]])
        px = jnp.concatenate([jnp.full(s, -(1 << 30), _I32), sx[:-s]])
        dx = sx - px
        hit = (pv == sv) & (dx <= W)
        down = down | jnp.where(hit, jnp.left_shift(1, dx), 0)
        nv = jnp.concatenate([sv[s:], jnp.full(s, -1, _I32)])
        nx = jnp.concatenate([sx[s:], jnp.full(s, -(1 << 30), _I32)])
        du = nx - sx
        hitu = (nv == sv) & (du >= 1) & (du <= W)
        up = up | jnp.where(hitu, jnp.left_shift(1, du), 0)
    z = jnp.zeros(m, dtype=_I32)
    return z.at[si].set(down), z.at[si].set(up)


def member_masks(seg: np.ndarray, val: np.ndarray, W: int):
    """Per-arc bitmasks: ``down`` bit r set iff arc (seg-r, val) exists,
    ``up`` bit r set iff arc (seg+r, val) exists (r in 1..W)."""
    with jax.enable_x64(True):
        return _member_masks_dev(jnp.asarray(seg, dtype=_I32),
                                 jnp.asarray(val, dtype=_I32), W)


# ---------------------------------------------------------------------------
# segmented-scan helpers (arc arrays; is_first marks each node's first arc)
# ---------------------------------------------------------------------------


def _seg_cumsum_excl(x, first_idx):
    """Exclusive per-segment cumsum: number of earlier x (summed) in the
    same segment."""
    cs = jnp.cumsum(x)
    incl = cs - jnp.take(cs, first_idx) + jnp.take(x, first_idx)
    return incl - x


def _prev_where(cond, first_idx):
    """Index of the latest position j < i in i's segment with cond[j],
    or -1.  (Global cummax works: indices are monotone so earlier segments
    can't win once the segment start resets the comparison via the >=
    first_idx guard.)"""
    m = cond.shape[0]
    i = jnp.arange(m, dtype=_I32)
    v = jnp.where(cond, i, -1)
    cm = jax.lax.cummax(v)
    prev = jnp.concatenate([jnp.full(1, -1, _I32), cm[:-1]])
    return jnp.where(prev >= first_idx, prev, -1)


def _next_where(cond, last_idx):
    """Index of the earliest position j > i in i's segment with cond[j],
    or -1."""
    m = cond.shape[0]
    i = jnp.arange(m, dtype=_I32)
    v = jnp.where(cond, i, jnp.asarray(1 << 30, _I32))
    cmr = jnp.flip(jax.lax.cummin(jnp.flip(v)))
    nxt = jnp.concatenate([cmr[1:], jnp.full(1, 1 << 30, _I32)])
    return jnp.where(nxt <= last_idx, nxt, -1)


def _at_or_after_where(cond, last_idx):
    """Earliest j >= i in i's segment with cond[j], or -1."""
    m = cond.shape[0]
    i = jnp.arange(m, dtype=_I32)
    v = jnp.where(cond, i, jnp.asarray(1 << 30, _I32))
    res = jnp.flip(jax.lax.cummin(jnp.flip(v)))
    return jnp.where(res <= last_idx, res, -1)


# ---------------------------------------------------------------------------
# copy-block costs / tokens (over REF-list arcs)
# ---------------------------------------------------------------------------


def _blocks_scan(mem, is_first, first_idx, last_idx):
    """Shared RLE analysis of a ref-list membership mask.

    Returns (lead, trans_at, run_end_internal, blk_val, blk_j):
      lead[i]: segment's first element is F (virtual leading empty copy run)
      trans_at[i]: run transition at i (i > seg start)
      run_end_internal[i]: i ends a run that is NOT the segment's last
      blk_val[i]: run length ending at i; blk_j[i]: its 0-based block index
      (counting the virtual leading run)."""
    prev_mem = jnp.concatenate([jnp.zeros(1, jnp.bool_), mem[:-1]])
    trans_at = (~is_first) & (mem != prev_mem)
    lead_seg = ~jnp.take(mem, first_idx)      # per-arc: segment starts F
    rid = _seg_cumsum_excl(trans_at.astype(_I32), first_idx) \
        + trans_at.astype(_I32)               # inclusive run index
    i = jnp.arange(mem.shape[0], dtype=_I32)
    start_cond = trans_at | is_first
    rs = jnp.where(start_cond, i, -1)
    rs = jax.lax.cummax(rs)                   # current run start (monotone)
    nxt = jnp.concatenate([trans_at[1:], jnp.zeros(1, jnp.bool_)])
    run_end_internal = nxt & (i < last_idx)   # a transition follows in-seg
    blk_val = i - rs + 1
    blk_j = rid + lead_seg.astype(_I32)
    return lead_seg, trans_at, run_end_internal, blk_val, blk_j


def _blocks_cost(mem, is_first, first_idx, last_idx, spec):
    """Per-arc block-token cost + per-arc-at-seg-start (bc value) parts.

    Returns (cost_per_arc int32, bc int32 per arc valid at seg start)."""
    lead, trans_at, rei, blk_val, blk_j = _blocks_scan(
        mem, is_first, first_idx, last_idx)
    emitted = jnp.where(blk_j > 0, blk_val - 1, blk_val)
    cost = jnp.where(rei,
                     _code_len(spec["block"], emitted, spec["zk"]), 0)
    # virtual leading empty block: value 0 at j = 0, attached to seg start
    cost = cost + jnp.where(is_first & lead,
                            _code_len(spec["block"],
                                      jnp.zeros_like(blk_val), spec["zk"]),
                            0)
    ntrans = _seg_cumsum_excl(trans_at.astype(_I32), first_idx) \
        + trans_at.astype(_I32)
    bc = jnp.take(ntrans, last_idx) + lead.astype(_I32)  # per arc
    return cost, bc


# ---------------------------------------------------------------------------
# extras (intervals + residuals) costs over CURR-list arcs
# ---------------------------------------------------------------------------


def _extras_scan(kept, v, is_first, first_idx, last_idx, minint: int):
    """Shared interval/residual analysis of a kept (extras) mask.

    Returns dict with per-arc: is_int (intervalized), int_start, res (is
    residual), ce (exclusive kept count), run_len (at int_start), plus
    helpers."""
    pk = _prev_where(kept, first_idx)
    pv = jnp.take(v, jnp.maximum(pk, 0))
    chain = kept & (pk >= 0) & (v == pv + 1)
    run_start = kept & ~chain
    ce = _seg_cumsum_excl(kept.astype(_I32), first_idx)
    i = jnp.arange(kept.shape[0], dtype=_I32)
    rs = jax.lax.cummax(jnp.where(run_start, i, -1))
    rs = jnp.where(rs >= first_idx, rs, first_idx)  # clamp (kept-only use)
    # run end: kept position whose next kept (if any, in-seg) starts a run
    nk = _next_where(kept, last_idx)
    nk_chain = jnp.where(nk >= 0, jnp.take(chain, jnp.maximum(nk, 0)),
                         False)
    run_end = kept & ((nk < 0) | ~nk_chain)
    re_idx = _at_or_after_where(run_end, last_idx)
    # total kept in run (valid at kept positions)
    L = jnp.take(ce, jnp.maximum(re_idx, 0)) - jnp.take(ce, rs) + 1
    if minint > 0:
        is_int = kept & (L >= minint)
    else:
        is_int = jnp.zeros_like(kept)
    int_start = run_start & is_int
    res = kept & ~is_int
    return dict(chain=chain, run_start=run_start, run_end=run_end, ce=ce,
                rs=rs, re_idx=re_idx, L=L, is_int=is_int,
                int_start=int_start, res=res)


def _extras_cost(kept, v, gx, is_first, first_idx, last_idx, spec):
    """Per-arc extras cost + the per-node interval-count token cost.

    The interval-count token (gamma) is attached to the segment's first
    arc; it exists iff the node has any extras and minint > 0."""
    minint = spec["minint"]
    E = _extras_scan(kept, v, is_first, first_idx, last_idx, minint)
    cost = jnp.zeros(kept.shape[0], dtype=_I32)
    if minint > 0:
        # interval tokens at interval run starts: left code + len code
        iidx = _seg_cumsum_excl(E["int_start"].astype(_I32), first_idx)
        prev_is = _prev_where(E["int_start"], first_idx)
        pl = jnp.take(v, jnp.maximum(prev_is, 0))
        pL = jnp.take(E["L"], jnp.maximum(prev_is, 0))
        left_val = jnp.where(iidx == 0,
                             _int2nat(v.astype(_I64) - gx.astype(_I64)),
                             (v - (pl + pL) - 1).astype(_I64))
        cost = cost + jnp.where(
            E["int_start"],
            _code_len(_C.GAMMA, left_val)
            + _code_len(_C.GAMMA, E["L"] - minint), 0)
        # per-node interval count token (gamma), on the first arc, only
        # when the node has extras
        n_int = jnp.take(
            _seg_cumsum_excl(E["int_start"].astype(_I32), first_idx)
            + E["int_start"].astype(_I32), last_idx)
        has_extras = (jnp.take(E["ce"], last_idx)
                      + jnp.take(kept, last_idx).astype(_I32)) > 0
        cost = cost + jnp.where(is_first & has_extras,
                                _code_len(_C.GAMMA, n_int), 0)
    # residual tokens
    ridx = _seg_cumsum_excl(E["res"].astype(_I32), first_idx)
    prev_r = _prev_where(E["res"], first_idx)
    pr = jnp.take(v, jnp.maximum(prev_r, 0))
    res_val = jnp.where(ridx == 0,
                        _int2nat(v.astype(_I64) - gx.astype(_I64)),
                        (v - pr - 1).astype(_I64))
    cost = cost + jnp.where(E["res"],
                            _code_len(spec["res"], res_val, spec["zk"]), 0)
    return cost


# ---------------------------------------------------------------------------
# cost matrix
# ---------------------------------------------------------------------------


def _spec(settings) -> Dict[str, int]:
    return dict(outd=settings.outdegree_coding,
                ref=settings.reference_coding,
                bcount=settings.block_count_coding,
                block=settings.block_coding,
                res=settings.residual_coding,
                off=settings.offset_coding,
                zk=settings.zeta_k,
                minint=settings.min_interval_length,
                W=settings.window_size)


@functools.partial(jax.jit, static_argnames=("spec_t",))
def _cost_matrix_dev(seg, v, gx, is_first, first_idx, last_idx, down, up,
                     co, node_gx, spec_t):
    """costs[x, r] for r in 0..W (int64; -1 = ineligible by construction
    is left to the selection pass — here every r with an existing nonempty
    ref list gets a real cost, others get a huge cost)."""
    spec = dict(spec_t)
    W = spec["W"]
    n = co.shape[0] - 1
    outd = (co[1:] - co[:-1]).astype(_I32)
    costs = []
    # r = 0: no blocks, extras = whole list
    c0 = _extras_cost(jnp.ones_like(is_first), v, gx, is_first, first_idx,
                      last_idx, spec)
    cost0 = jax.ops.segment_sum(c0, seg, num_segments=n,
                                indices_are_sorted=True)
    cost0 = cost0 + _code_len(spec["ref"], jnp.zeros(n, _I32)) \
        * (1 if W > 0 else 0)
    costs.append(cost0.astype(_I64))
    for r in range(1, W + 1):
        # blocks over ref lists: arc k of node y is in the ref list of
        # x = y + r; mem = does (y + r, w) exist = up bit r
        mem = ((up >> r) & 1).astype(jnp.bool_)
        bcost_arc, bc_arc = _blocks_cost(mem, is_first, first_idx,
                                         last_idx, spec)
        bcost = jax.ops.segment_sum(bcost_arc, seg, num_segments=n,
                                    indices_are_sorted=True)
        bc = jax.ops.segment_sum(
            jnp.where(is_first, bc_arc, 0), seg, num_segments=n,
            indices_are_sorted=True)
        bcost = bcost + _code_len(spec["bcount"], bc)
        # shift to x = y + r
        pad = jnp.zeros(r, dtype=bcost.dtype)
        bcost_x = jnp.concatenate([pad, bcost[:n - r]])
        # extras over curr lists: kept = not copied = down bit r unset
        kept = ~(((down >> r) & 1).astype(jnp.bool_))
        ecost_arc = _extras_cost(kept, v, gx, is_first, first_idx,
                                 last_idx, spec)
        ecost = jax.ops.segment_sum(ecost_arc, seg, num_segments=n,
                                    indices_are_sorted=True)
        total = (bcost_x + ecost
                 + _code_len(spec["ref"], jnp.full(n, r, _I32)))
        # eligibility by list existence is the selection pass's job; mark
        # x < r (no such window slot) with -1
        total = jnp.where(jnp.arange(n) < r, -1, total)
        costs.append(total.astype(_I64))
    return jnp.stack(costs, axis=1)  # (n, W+1)


def cost_matrix(co: np.ndarray, succ: np.ndarray, settings,
                node_base: int = 0) -> np.ndarray:
    """Candidate cost matrix (n, W+1): diff_comp bit counts for every
    window candidate (BVGraph.java:2256-2266 sizing pass, vectorized).
    ``node_base``: global id of local node 0 (for sliced encodes)."""
    spec = _spec(settings)
    co = np.asarray(co, dtype=np.int64)
    n = len(co) - 1
    m = int(co[-1])
    seg = np.repeat(np.arange(n, dtype=np.int32),
                    np.diff(co).astype(np.int64))
    with jax.enable_x64(True):
        segj = jnp.asarray(seg)
        vj = jnp.asarray(np.asarray(succ, dtype=np.int32))
        gxj = segj + np.int32(node_base)
        is_first = jnp.asarray(_is_first_np(co, m))
        first_idx = jnp.asarray(np.repeat(co[:-1], np.diff(co))
                                .astype(np.int32))
        last_idx = jnp.asarray(np.repeat(co[1:] - 1, np.diff(co))
                               .astype(np.int32))
        down, up = _member_masks_dev(segj, vj, spec["W"]) \
            if spec["W"] > 0 else (jnp.zeros(m, _I32), jnp.zeros(m, _I32))
        cm = _cost_matrix_dev(segj, vj, gxj, is_first, first_idx, last_idx,
                              down, up, jnp.asarray(co), None,
                              tuple(sorted(spec.items())))
        return np.asarray(cm)


def _is_first_np(co, m):
    f = np.zeros(m, dtype=bool)
    f[co[:-1][np.diff(co) > 0]] = True
    return f


def select_refs(costs: np.ndarray, outd: np.ndarray, settings,
                chunk_bounds: Optional[np.ndarray] = None) -> np.ndarray:
    """Greedy reference selection (native wg_select_refs; the one
    sequential pass — BVGraph.java:2256-2270 semantics with window resets
    at chunk bounds)."""
    from .. import native as _native
    n = len(outd)
    if chunk_bounds is None:
        chunk_bounds = np.asarray([0, n], dtype=np.int64)
    return _native.select_refs(costs, np.asarray(outd, dtype=np.int64),
                               settings.window_size,
                               settings.max_ref_count,
                               np.asarray(chunk_bounds, dtype=np.int64))
