"""Vectorized BVGraph parse — v2 engine (the TPU hot path).

Re-designed phase-1 parser (see vdecode.py for the overall two-phase
architecture and reference citations).  Differences from the v1 engine:

- **pass 0.5**: the per-node reference and block count are read by two
  fully-vectorized code reads (no loop) — the state machine starts directly
  at copy-block / extra parsing.
- **virtual lanes**: one single while_loop; every lane owns a private queue
  of nodes (round-robin over the size-sorted order), loading the next node
  the moment it finishes one.  Total steps ~ total_work / lanes + longest
  single node, instead of sum of per-batch maxima.
- **register-chained decoding**: each step fetches ONE 8-word (256-bit)
  window per lane and decodes up to CHAIN codes from registers (residual
  gaps and interval emissions chain; blocks/intervals decode one per step).
- **single scatter per step**: all writes (successor values AND copy-block
  lengths) target one combined buffer  [out(m+1) | blocks((n+1)*MB) | dump],
  scattered once per step with unique indices.

Everything int32: node chunks are bounded to < 2^31 bits / arcs.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .vdecode import (
    K_DELTA, K_GAMMA, K_GOLOMB, K_NIBBLE, K_NONE, K_UNARY, K_ZETA,
    ParseConfig, _clz, _nat2int, _read_unary, read_code,
)

__all__ = ["pass05", "parse_v2"]

# v2 parser states
V_LOAD, V_BLOCK, V_INTCNT, V_ILEFT, V_ILEN, V_IEMIT, V_RESF, V_RES, V_EXH = range(9)

CHAIN = 4          # max codes/emissions per lane per step
WIN = 8            # window words per lane (256 bits)
CHAIN_LIMIT = 192  # chain while next code starts at bit offset <= 256-64


def _u32(x):
    return x.astype(jnp.uint32)


def _pick(win, j):
    """win[:, j] with per-lane column index j (0..WIN-1), via a select chain."""
    out = jnp.zeros_like(win[:, 0])
    for k in range(WIN):
        out = jnp.where(j == k, win[:, k], out)
    return out


def _win64(win, off):
    """64 bits of the window starting at per-lane bit offset ``off``."""
    wj = off >> 5
    o = _u32(off & 31)
    w0 = _pick(win, wj)
    w1 = _pick(win, wj + 1)
    w2 = _pick(win, wj + 2)
    ok = o > 0
    no = jnp.where(ok, jnp.uint32(32) - o, 1)
    hi = (w0 << o) | jnp.where(ok, w1 >> no, 0)
    lo = (w1 << o) | jnp.where(ok, w2 >> no, 0)
    return hi, lo


def _clz64(hi, lo):
    return jnp.where(hi != 0, _clz(hi), 32 + _clz(lo))


def _win_unary(win, off, active):
    """Unary scan over the first 128 window bits after ``off``.

    Returns (u, found): found=False when no terminator was seen within the
    scanned bits; the caller then consumes the scanned zeros in-register and
    retries next step (NO nested control flow: nested while/cond programs
    poison the TPU runtime into a permanently slow dispatch mode)."""
    hi, lo = _win64(win, off)
    u = _clz64(hi, lo)
    allz = (hi == 0) & (lo == 0)
    hi2, lo2 = _win64(win, off + 64)
    u2 = 64 + _clz64(hi2, lo2)
    allz2 = allz & (hi2 == 0) & (lo2 == 0)
    u = jnp.where(allz, u2, u)
    found = active & ~allz2
    return jnp.where(active, u, 0), found


def _win_bits(win, off, nbits):
    """nbits (0..32) of the window at per-lane offset ``off`` (uint -> i32)."""
    hi, _ = _win64(win, off)
    nb = _u32(jnp.clip(nbits, 0, 32))
    ok = nb > 0
    return jnp.where(ok, hi >> jnp.where(ok, jnp.uint32(32) - nb, 1),
                     0).astype(jnp.int32)


def _shl1(n):
    return (jnp.uint32(1) << _u32(jnp.clip(n, 0, 31))).astype(jnp.int32)


def _win_code(win, off, kind, cfg: ParseConfig, kinds_used, active,
              u_acc=None):
    """Decode one code of per-lane ``kind`` from window registers.

    Returns (value, length, ok).  For ~ok lanes, ``length`` is the number of
    leading-zero bits that may be consumed now (the lane stays in its state,
    adds them to its unary accumulator ``u_acc``, and finishes the code in a
    later step) — long codes never need nested control flow.
    """
    unary_kinds = {K_UNARY, K_GAMMA, K_DELTA, K_ZETA, K_GOLOMB}
    act_unary = jnp.zeros_like(active)
    for k in set(kinds_used) & unary_kinds:
        act_unary = act_unary | (kind == k)
    act_unary = act_unary & active
    u_win, found = _win_unary(win, off, act_unary)
    # the code must fully fit: terminator + <= 63 value bits in the window
    fits = found & (off + u_win <= 192)
    ok = jnp.where(act_unary, fits, active)
    if u_acc is not None:
        u = jnp.where(act_unary, u_acc + u_win, u_win)
    else:
        u = u_win
    # bits consumable by stuck lanes: zeros seen, capped (never the 1-bit)
    zskip = jnp.minimum(jnp.where(found, u_win, 128), 128)
    body = off + u_win + 1

    value = jnp.zeros_like(off)
    ln = jnp.zeros_like(off)

    if K_UNARY in kinds_used:
        m = kind == K_UNARY
        value = jnp.where(m, u, value)
        ln = jnp.where(m, u_win + 1, ln)
    if K_GAMMA in kinds_used:
        m = kind == K_GAMMA
        bits = _win_bits(win, body, jnp.where(m, u, 0))
        value = jnp.where(m, (_shl1(u) | bits) - 1, value)
        ln = jnp.where(m, u_win + u + 1, ln)
    if K_DELTA in kinds_used:
        m = kind == K_DELTA
        mant = _win_bits(win, body, jnp.where(m, u, 0))
        e = (_shl1(u) | mant) - 1
        bits2 = _win_bits(win, body + u, jnp.where(m, e, 0))
        value = jnp.where(m, (_shl1(e) | bits2) - 1, value)
        ln = jnp.where(m, u_win + 1 + u + e, ln)
    if K_ZETA in kinds_used:
        k = cfg.zeta_k
        m = kind == K_ZETA
        l1 = u * k + (k - 1)
        bits = _win_bits(win, body, jnp.where(m, l1, 0))
        left = _shl1(u * k)
        short = bits < left
        extra = _win_bits(win, body + l1, jnp.where(m & ~short, 1, 0))
        value = jnp.where(m, jnp.where(short, bits + left - 1,
                                       (bits << 1) + extra - 1), value)
        ln = jnp.where(m, u_win + 1 + l1 + jnp.where(short, 0, 1), ln)
    if K_GOLOMB in kinds_used:
        b = cfg.zeta_k
        s = max(b.bit_length() - 1, 0)
        mshort = (1 << (s + 1)) - b
        m = kind == K_GOLOMB
        bits = _win_bits(win, body, jnp.where(m, s, 0))
        short = bits < mshort
        extra = _win_bits(win, body + s, jnp.where(m & ~short, 1, 0))
        r = jnp.where(short, bits, (bits << 1) + extra - mshort)
        value = jnp.where(m, u * b + r, value)
        ln = jnp.where(m, u_win + 1 + s + jnp.where(short, 0, 1), ln)
    if K_NIBBLE in kinds_used:
        m = kind == K_NIBBLE
        acc = jnp.zeros_like(off)
        p = off
        done = ~m
        for _ in range(11):  # 64-bit values need <= 22 nibbles; 33 bits -> 11
            nib = _win_bits(win, p, jnp.where(done, 0, 4))
            acc = jnp.where(done, acc, (acc << 3) | (nib & 7))
            p = jnp.where(done, p, p + 4)
            done = done | ((nib & 8) != 0)
        ok = ok & (done | ~m)
        value = jnp.where(m, acc, value)
        ln = jnp.where(m, p - off, ln)

    ln = jnp.where(ok, ln, zskip)
    return value, ln, ok


# ---------------------------------------------------------------------------
# pass 0.5: vectorized reference + block count reads
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg",))
def pass05(words, pos_a, d, cfg: ParseConfig):
    """Read per-node reference and block count (vectorized, no loop).

    pos_a: bit position after the outdegree.  Returns (ref, bc, pos_c).
    """
    if cfg.window_size == 0:
        z = jnp.zeros_like(pos_a)
        return z, z, pos_a
    kind = jnp.where(d > 0, cfg.reference_coding, K_NONE)
    ref, adv, uo_a = read_code(words, pos_a, kind, cfg,
                               (cfg.reference_coding,))
    ref = jnp.where(d > 0, ref, 0)
    pos_b = pos_a + adv
    kindb = jnp.where(ref > 0, cfg.block_count_coding, K_NONE)
    bc, advb, uo_b = read_code(words, pos_b, kindb, cfg,
                                (cfg.block_count_coding,))
    bc = jnp.where(ref > 0, bc, 0)
    return ref, bc, pos_b + advb


# ---------------------------------------------------------------------------
# the main loop
# ---------------------------------------------------------------------------


def _state_kind_table_v2(cfg: ParseConfig):
    return (
        K_NONE,                   # V_LOAD
        cfg.block_coding,         # V_BLOCK
        K_GAMMA,                  # V_INTCNT
        K_GAMMA,                  # V_ILEFT
        K_GAMMA,                  # V_ILEN
        K_NONE,                   # V_IEMIT
        cfg.residual_coding,      # V_RESF
        cfg.residual_coding,      # V_RES
        K_NONE,                   # V_EXH
    )


def _machine(words, meta, big_out, n_queue, blocks_off, regs,
             cfg: ParseConfig):
    """Advance the virtual-lane state machine by ``unroll`` steps.

    meta: (n_queue_padded, 8) int32 node descriptors in processing order:
      [local_x, pos_c, d, bc, global_x, ref_outd, csr_base, copied0]
    big_out: int32 [ out(m+1) | blocks((n+1)*MB) | dump(1) ].

    The steps are PYTHON-UNROLLED inside the jit: on this TPU runtime any
    gather executed inside a lax.while_loop/cond body runs ~1000x slower
    AND permanently degrades every later program in the process, so the
    decoder never loops on device — the host dispatches megasteps until all
    lanes reach V_EXH (run_parse).
    """
    MB = cfg.max_blocks
    table = jnp.asarray(_state_kind_table_v2(cfg), dtype=jnp.int32)
    kinds_used = tuple(sorted(
        set(_state_kind_table_v2(cfg)) - {K_NONE}))
    B = cfg.batch
    lane = jnp.arange(B, dtype=jnp.int32)
    big_n = big_out.shape[0]
    # unique out-of-bounds dump indices per (lane, write entry): entry e of
    # lane i dumps to big_n + i*8 + e (dropped by mode="drop")
    dump = big_n + lane * 8

    min_int = cfg.min_interval_length

    meta_cols = tuple(meta[:, i] for i in range(8))  # 1-D gather sources

    def load_regs(regs, want):
        """Load the next queued node into lanes with ``want``."""
        qidx = regs["q"]
        has = want & (qidx < n_queue)
        qi = jnp.where(has, qidx, 0)
        col = lambda i: jnp.take(meta_cols[i], qi, mode="clip")  # noqa: E731
        bx = col(0)          # blocks-row id (chunk-local)
        x = col(4)           # value-base id (global: successor values are
                             # computed relative to it)
        pos = col(1)
        d = col(2)
        bc = col(3)
        ref_outd = col(5)
        csr = col(6)
        copied0 = col(7)
        extra0 = d - copied0
        # state for bc == 0 nodes: straight to the extra part
        st_nb = jnp.where(min_int != 0, V_INTCNT, V_RESF)
        st_new = jnp.where(bc > 0, V_BLOCK, st_nb)
        sel = lambda f, v: jnp.where(has, v, regs[f])  # noqa: E731
        regs = dict(
            regs,
            q=jnp.where(has, qidx + B, qidx),
            st=jnp.where(want, jnp.where(has, st_new, V_EXH), regs["st"]),
            x=sel("x", x), bx=sel("bx", bx), pos=sel("pos", pos),
            d=sel("d", d),
            blk_rem=sel("blk_rem", bc), blk_idx=sel("blk_idx", 0),
            total=sel("total", 0), copied=sel("copied", copied0),
            ref_outd=sel("ref_outd", ref_outd), csr=sel("csr", csr),
            extra=sel("extra", extra0), int_rem=sel("int_rem", 0),
            idx=sel("idx", 0), prev=sel("prev", 0),
            u_acc=sel("u_acc", 0),
            emit_val=sel("emit_val", 0), emit_rem=sel("emit_rem", 0),
            res_rem=sel("res_rem", jnp.where(bc > 0, 0, extra0)),
            wp=sel("wp", csr + copied0),
        )
        return regs

    def enter_extras(regs, entering):
        """Pure transition into the extra part after copy-blocks."""
        extra = regs["d"] - regs["copied"]
        wp = regs["csr"] + regs["copied"]
        st_e = jnp.where(
            extra == 0, V_LOAD,
            jnp.where(min_int != 0, V_INTCNT, V_RESF))
        f = lambda k, v: jnp.where(entering, v, regs[k])  # noqa: E731
        return dict(
            regs,
            extra=f("extra", extra), wp=f("wp", wp), idx=f("idx", 0),
            res_rem=f("res_rem", jnp.where(min_int != 0, 0, extra)),
            st=f("st", st_e),
        )

    def body(c):
        regs, big = c
        # 1. load nodes into free lanes
        regs = load_regs(regs, regs["st"] == V_LOAD)
        st = regs["st"]
        pos = regs["pos"]

        # 2. fetch the per-lane window — as WIN separate 1-D gathers: a 2-D
        # gather inside a while body lowers catastrophically on this TPU
        # runtime (and degrades the whole process; see _win_unary note)
        wbase = pos >> 5
        win = jnp.stack(
            [jnp.take(words, wbase + i, mode="clip") for i in range(WIN)],
            axis=1)

        wslots = []
        wvals = []

        # ---- sub-step 0: one full-transition code ----
        kind = jnp.take(table, st, mode="clip")
        reads = kind != K_NONE
        off0 = pos & 31
        v, ln, ok = _win_code(win, off0, kind, cfg, kinds_used, reads,
                              regs["u_acc"])
        # lanes with an over-long unary run consume `ln` zero bits now and
        # finish the code in a later step (in-register accumulator; NEVER a
        # nested while/cond — those poison the TPU runtime, see _win_unary)
        stuck = reads & ~ok
        new = dict(regs,
                   pos=pos + jnp.where(reads, ln, 0),
                   u_acc=jnp.where(stuck, regs["u_acc"] + ln, 0))
        # stuck lanes must neither transition nor chain this step
        st = jnp.where(stuck, jnp.int32(-9), st)
        off = jnp.where(stuck, jnp.int32(255),
                        off0 + jnp.where(reads, ln, 0))

        def sel(state, field, val):
            new[field] = jnp.where(st == state, val, new[field])

        x = regs["x"]

        # V_BLOCK
        b = v + jnp.where(regs["blk_idx"] > 0, 1, 0)
        is_blk = st == V_BLOCK
        bslot = (blocks_off + regs["bx"] * MB
                 + jnp.minimum(regs["blk_idx"], MB - 1))
        wslots.append(jnp.where(is_blk & (regs["blk_idx"] < MB), bslot,
                                dump + 0))
        wvals.append(b)
        total = regs["total"] + b
        copied = regs["copied"] + jnp.where(regs["blk_idx"] % 2 == 0, b, 0)
        last = regs["blk_rem"] == 1
        even_cnt = (regs["blk_idx"] + 1) % 2 == 0
        copied = copied + jnp.where(last & even_cnt,
                                    regs["ref_outd"] - total, 0)
        sel(V_BLOCK, "total", total)
        sel(V_BLOCK, "copied", copied)
        sel(V_BLOCK, "blk_idx", regs["blk_idx"] + 1)
        sel(V_BLOCK, "blk_rem", regs["blk_rem"] - 1)
        # blocks done -> extras (pure)
        blk_done = is_blk & last
        new = enter_extras(new, blk_done)

        if min_int != 0:
            # V_INTCNT
            sel(V_INTCNT, "int_rem", v)
            sel(V_INTCNT, "idx", jnp.int32(0))
            sel(V_INTCNT, "res_rem", jnp.where(v == 0, regs["extra"], 0))
            sel(V_INTCNT, "st", jnp.where(v == 0, V_RESF, V_ILEFT))
            # V_ILEFT
            left = jnp.where(regs["idx"] == 0, x + _nat2int(v),
                             regs["prev"] + 1 + v)
            sel(V_ILEFT, "emit_val", left)
            sel(V_ILEFT, "st", V_ILEN)
            # V_ILEN  (emit_val currently = left)
            ilen = v + min_int
            sel(V_ILEN, "emit_rem", ilen)
            sel(V_ILEN, "prev", regs["emit_val"] + ilen)
            sel(V_ILEN, "extra", regs["extra"] - ilen)
            sel(V_ILEN, "int_rem", regs["int_rem"] - 1)
            sel(V_ILEN, "idx", regs["idx"] + 1)
            sel(V_ILEN, "st", V_IEMIT)

        # V_RESF / V_RES (sub-step 0 read)
        is_rf = st == V_RESF
        is_rs = st == V_RES
        rval = jnp.where(is_rf, x + _nat2int(v), regs["prev"] + v + 1)
        for s_ in (V_RESF, V_RES):
            sel(s_, "prev", rval)
            sel(s_, "wp", regs["wp"] + 1)
            sel(s_, "res_rem", regs["res_rem"] - 1)
            sel(s_, "st", jnp.where(regs["res_rem"] == 1, V_LOAD, V_RES))
        # sub-step-0 interval emission (IEMIT reads no bits but must not
        # waste the step)
        is_emit0 = st == V_IEMIT
        ev0 = regs["emit_val"]
        wslots.append(jnp.where(is_rf | is_rs | is_emit0, regs["wp"],
                                dump + 1))
        wvals.append(jnp.where(is_emit0, ev0, rval))
        if min_int != 0:
            sel(V_IEMIT, "emit_val", ev0 + 1)
            sel(V_IEMIT, "emit_rem", regs["emit_rem"] - 1)
            sel(V_IEMIT, "wp", regs["wp"] + 1)
            emit_done0 = is_emit0 & (regs["emit_rem"] == 1)
            after0 = jnp.where(
                regs["int_rem"] > 0, V_ILEFT,
                jnp.where(regs["extra"] > 0, V_RESF, V_LOAD))
            sel(V_IEMIT, "res_rem",
                jnp.where(emit_done0 & (regs["int_rem"] == 0), regs["extra"],
                          regs["res_rem"]))
            sel(V_IEMIT, "st",
                jnp.where(regs["emit_rem"] == 1, after0, V_IEMIT))

        # ---- sub-steps 1..CHAIN-1: chained residuals / interval emission ----
        for _c in range(1, CHAIN):
            dump_c = dump + 1 + _c
            stc = new["st"]
            # chained residual read (register window only)
            chain_res = (stc == V_RES) & (off <= CHAIN_LIMIT) & reads
            kc = jnp.where(chain_res, cfg.residual_coding, K_NONE)
            vc, lnc, okc = _win_code(win, off, kc, cfg,
                                     (cfg.residual_coding,), chain_res)
            chain_res = chain_res & okc  # failed chains retry next step
            rv = new["prev"] + vc + 1
            emi = stc == V_IEMIT
            # interval emission (no bits)
            ev = new["emit_val"]
            wslots.append(jnp.where(chain_res | emi, new["wp"], dump_c))
            wvals.append(jnp.where(emi, ev, rv))
            # apply residual-chain effects
            new["prev"] = jnp.where(chain_res, rv, new["prev"])
            new["pos"] = jnp.where(chain_res, new["pos"] + lnc, new["pos"])
            off = jnp.where(chain_res, off + lnc, off)
            new["wp"] = jnp.where(chain_res | emi, new["wp"] + 1, new["wp"])
            new["res_rem"] = jnp.where(chain_res, new["res_rem"] - 1,
                                       new["res_rem"])
            new["st"] = jnp.where(chain_res & (new["res_rem"] == 0), V_LOAD,
                                  new["st"])
            # interval emission bookkeeping
            if min_int != 0:
                new["emit_val"] = jnp.where(emi, ev + 1, new["emit_val"])
                new["emit_rem"] = jnp.where(emi, new["emit_rem"] - 1,
                                            new["emit_rem"])
                emit_done = emi & (new["emit_rem"] == 0)
                after = jnp.where(
                    new["int_rem"] > 0, V_ILEFT,
                    jnp.where(new["extra"] > 0, V_RESF, V_LOAD))
                new["res_rem"] = jnp.where(
                    emit_done & (new["int_rem"] == 0), new["extra"],
                    new["res_rem"])
                new["st"] = jnp.where(emit_done, after, new["st"])

        # ---- single scatter ----
        slots = jnp.stack(wslots, axis=1).reshape(-1)
        vals = jnp.stack(wvals, axis=1).reshape(-1)
        big = big.at[slots].set(vals, mode="drop", unique_indices=True)
        return new, big

    return body, (regs, big_out)


@functools.partial(jax.jit, static_argnames=("cfg", "unroll"),
                   donate_argnums=(2, 5))
def parse_v2_megastep(words, meta, big_out, n_queue, blocks_off, regs,
                      cfg: ParseConfig, unroll: int):
    """``unroll`` machine steps, python-unrolled (the TPU path; gathers must
    stay out of device loops on this runtime — see _machine docstring)."""
    body, c = _machine(words, meta, big_out, n_queue, blocks_off, regs, cfg)
    for _ in range(unroll):
        c = body(c)
    return c


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(2, 5))
def parse_v2_while(words, meta, big_out, n_queue, blocks_off, regs,
                   cfg: ParseConfig):
    """Run the machine to completion in one device while_loop.

    Used on backends without the gather-in-loop pathology (CPU tests); the
    TPU path uses parse_v2_megastep."""
    body, c = _machine(words, meta, big_out, n_queue, blocks_off, regs, cfg)

    def cond(c):
        return jnp.any(c[0]["st"] != V_EXH)

    return jax.lax.while_loop(cond, body, c)


def init_regs(cfg: ParseConfig):
    """Initial lane registers (all lanes in V_LOAD with queue head i)."""
    B = cfg.batch
    zero = np.zeros(B, dtype=np.int32)
    regs = dict(
        q=np.arange(B, dtype=np.int32),
        st=np.full(B, V_LOAD, np.int32), x=zero, bx=zero, pos=zero,
        d=zero, blk_rem=zero, blk_idx=zero, total=zero, copied=zero,
        ref_outd=zero, csr=zero, extra=zero, int_rem=zero, idx=zero,
        prev=zero, emit_val=zero, emit_rem=zero, res_rem=zero, wp=zero,
        u_acc=zero,
    )
    return {k: jnp.asarray(v) for k, v in regs.items()}


def parse_step_bound(bc, extra, n_queue, batch):
    """Safe upper bound on megasteps: per node <= bc + 3*extra + 2 steps,
    summed over each lane's private queue (round-robin assignment)."""
    per_node = bc[:n_queue].astype(np.int64) + 3 * np.maximum(
        extra[:n_queue].astype(np.int64), 0) + 2
    lane_tot = np.zeros(batch, dtype=np.int64)
    np.add.at(lane_tot, np.arange(n_queue) % batch, per_node)
    return int(lane_tot.max(initial=1))


def default_unroll() -> int:
    """Megastep unroll factor: big on TPU (dispatch amortization), small on
    CPU (XLA CPU compile time grows superlinearly with program size)."""
    return 4 if jax.default_backend() == "cpu" else 32


def run_parse(words, meta, big_out, n_queue, blocks_off, cfg: ParseConfig,
              step_bound=None, unroll: int = 0, check_every: int = 4):
    """Host-driven parse: dispatch megasteps until every lane is exhausted.

    On CPU backends the whole machine runs as one device while_loop (no
    dispatch overhead, no runtime pathology there); on TPU the host
    dispatches python-unrolled megasteps and polls for completion."""
    regs = init_regs(cfg)
    nq = jnp.int32(n_queue)
    boff = jnp.int32(blocks_off)
    if jax.default_backend() == "cpu":
        regs, big_out = parse_v2_while(words, meta, big_out, nq, boff,
                                       regs, cfg=cfg)
        return big_out
    if not unroll:
        unroll = default_unroll()
    steps = 0
    k = 0
    while True:
        regs, big_out = parse_v2_megastep(words, meta, big_out, nq, boff,
                                          regs, cfg=cfg, unroll=unroll)
        steps += unroll
        k += 1
        if step_bound is not None and steps >= step_bound:
            break
        if k % check_every == 0 and bool(jnp.all(regs["st"] == V_EXH)):
            break
    return big_out
