"""Probe: output-store strategies for the decode kernel flush (round-5 #1).

The decode kernel's out_flush1 is a masked RMW select sweep over all V8
output groups every flush interval (~half the ~2.3us step at V=512).
Candidate replacements, timed here as minimal while_loop kernels that run
the SAME stage-register discipline (16 (8,128) i32 stage words updated per
step) plus the flush variant every 4 steps:

  none       no flush at all (floor: staging + loop cost)
  rmw        today's out_flush1: masked select RMW over V8 groups
  mstore     masked store (pltpu.store with mask): write-only, no read
  rmw3       3-bank stage: one 3-group RMW sweep every 12 steps
  window8    scalar-windowed RMW: dynamic-slice 8-group window around the
             cross-lane max group, full sweep never (correctness fallback
             not modeled — cost probe only)
  tmajor     time-major: stage banks stored at the scalar flush index
             (out[fi] = bank), no mask, no read
  read64     no flush; adds today's out_read-style V8-group gather sweep
             every step (sizes the copy-read cost)

Run on the real chip: python experiments/pallas_probe17.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_cache"))
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ = np.asarray(jax.jit(lambda x: x + 1)(jnp.ones((8, 128), jnp.int32)))

STEPS = 4096
V8 = 64          # output groups per lane (V=512)
F8 = 80          # time-major slabs (stage flushes)


def make(variant):
    def kernel(x_ref, o_ref, out_buf, tm_buf):
        rows_G = jax.lax.broadcasted_iota(jnp.int32, (V8, 8, 128), 0)

        def body(c):
            step, wcur, acc, stw = c[0], c[1], c[2], list(c[3:])
            # staging: 2 values/step into the 16 stage words (burst=2 path)
            for t in range(2):
                wt = wcur + t
                slot_j = wt & 7
                bank = (wt >> 3) & 1
                val = wt * 3
                for b in range(2):
                    for j in range(8):
                        sel = (bank == b) & (slot_j == j)
                        stw[b * 8 + j] = jnp.where(sel, val, stw[b * 8 + j])
            wcur = wcur + 2

            flush_now = (step & 3) == 3
            gb = (wcur >> 3) - 1
            gb = jnp.maximum(gb, 0) % V8

            if variant == "rmw":
                @pl.when(flush_now)
                def _():
                    m = rows_G == gb[None]
                    bsel = gb & 1
                    for j in range(8):
                        v = jnp.where(bsel == 0, stw[j], stw[8 + j])
                        out_buf[:, j] = jnp.where(m, v[None], out_buf[:, j])
            elif variant == "mstore":
                @pl.when(flush_now)
                def _():
                    m = rows_G == gb[None]
                    bsel = gb & 1
                    for j in range(8):
                        v = jnp.where(bsel == 0, stw[j], stw[8 + j])
                        pltpu.store(out_buf.at[:, j],
                                    jnp.broadcast_to(v[None], (V8, 8, 128)),
                                    mask=m)
            elif variant == "rmw3":
                @pl.when((step & 11) == 11)
                def _():
                    # one sweep placing 3 consecutive groups (approximated:
                    # same reads/writes, 3 compares + selects)
                    m0 = rows_G == gb[None]
                    m1 = rows_G == (gb - 1)[None]
                    m2 = rows_G == (gb - 2)[None]
                    for j in range(8):
                        cur = out_buf[:, j]
                        cur = jnp.where(m0, stw[j][None], cur)
                        cur = jnp.where(m1, stw[8 + j][None], cur)
                        cur = jnp.where(m2, stw[(j + 1) & 7][None], cur)
                        out_buf[:, j] = cur
            elif variant == "window8":
                @pl.when(flush_now)
                def _():
                    hi = jnp.max(gb)
                    lo = jnp.maximum(hi - 7, 0)
                    lo = jnp.minimum(lo, V8 - 8)
                    rows_W = jax.lax.broadcasted_iota(
                        jnp.int32, (8, 8, 128), 0)
                    m = rows_W == (gb - lo)[None]
                    bsel = gb & 1
                    for j in range(8):
                        v = jnp.where(bsel == 0, stw[j], stw[8 + j])
                        blk = out_buf[pl.ds(lo, 8), j]
                        out_buf[pl.ds(lo, 8), j] = jnp.where(
                            m, v[None], blk)
            elif variant == "tmajor":
                @pl.when(flush_now)
                def _():
                    fi = (step >> 2) % F8
                    bsel = gb & 1
                    for j in range(8):
                        v = jnp.where(bsel == 0, stw[j], stw[8 + j])
                        tm_buf[fi, j] = v
            elif variant == "read64":
                gsel = (wcur * 7) % V8
                m_g = rows_G == gsel[None]
                rd = jnp.zeros((8, 128), jnp.int32)
                for j in range(8):
                    rd = rd + jnp.sum(jnp.where(m_g, out_buf[:, j], 0),
                                      axis=0)
                acc = acc + rd

            return (step + 1, wcur, acc, *stw)

        def cond(c):
            return c[0] < STEPS

        init = (jnp.int32(0), x_ref[...] & 7,
                jnp.zeros((8, 128), jnp.int32)) + tuple(
            jnp.zeros((8, 128), jnp.int32) for _ in range(16))
        fin = jax.lax.while_loop(cond, body, init)
        o_ref[...] = fin[2] + fin[1] + out_buf[0, 0] + tm_buf[0, 0]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((V8, 8, 8, 128), jnp.int32),
            pltpu.VMEM((F8, 8, 8, 128), jnp.int32),
        ],
    )


def main():
    x = jnp.zeros((8, 128), jnp.int32)
    for variant in ("none", "rmw", "mstore", "rmw3", "window8", "tmajor",
                    "read64"):
        try:
            f = jax.jit(make(variant))
            r = f(x)
            r.block_until_ready()
            ts = []
            for _ in range(3):
                t0 = time.time()
                r = f(x)
                r.block_until_ready()
                ts.append(time.time() - t0)
            dt = sorted(ts)[1]
            print(f"{variant:9s} {dt / STEPS * 1e9:8.1f} ns/step "
                  f"({dt * 1e3:.1f} ms total)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{variant:9s} FAILED: {repr(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
