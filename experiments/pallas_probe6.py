"""Probe 6: the decode-kernel mechanics, end to end.

Validates + times the exact primitive set the BVGraph decode kernel needs:
  - lax.while_loop with ref mutation in the body (out/scratch buffers)
  - per-lane word fetch from a (R,8,128) VMEM column via masked compare-sum
    (the gather replacement: Mosaic does not lower big-table gathers)
  - per-lane masked write into a (V,8,128) VMEM output column
  - per-lane masked read back from the output column (copy-head reads)
  - 96-bit register bit-buffer shift/insert mechanics

Timing: steps are fixed; per-step cost = slope between two step counts
(readback RTT ~24 ms cancels).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 64
V = 640


def build(steps, interpret=False):
    def kernel(col_ref, out_ref, diag_ref):
        out_ref[:] = jnp.zeros((V, 8, 128), jnp.int32)
        rows_r = jax.lax.broadcasted_iota(jnp.int32, (R, 8, 128), 0)
        rows_v = jax.lax.broadcasted_iota(jnp.int32, (V, 8, 128), 0)

        def mload(rp):
            m = rows_r == rp[None]
            return jnp.sum(jnp.where(m, col_ref[:], 0), axis=0)

        def mread(row):
            m = rows_v == row[None]
            return jnp.sum(jnp.where(m, out_ref[:], 0), axis=0)

        def mwrite(row, val, en):
            m = (rows_v == row[None]) & en[None]
            out_ref[:] = jnp.where(m, val[None], out_ref[:])

        def body(c):
            step, rp, wcur, b0, b1, avail, acc = c
            # refill: lanes with avail <= 64 fetch their next column word
            need = avail <= 64
            w = mload(jnp.where(need, rp, R + 1)).astype(jnp.uint32)
            b1 = jnp.where(need, b1 | (w >> 16), b1)
            avail = jnp.where(need, avail + 32, avail)
            rp = jnp.where(need, rp + 1, rp)
            # fake decode: consume variable bits, mix buffer
            k = (b1 & 7).astype(jnp.int32) + 1
            b0 = (b0 << k.astype(jnp.uint32)) | (b1 >> (32 - k).astype(jnp.uint32))
            b1 = b1 << k.astype(jnp.uint32)
            avail = avail - k
            # copy-head read at a data-dependent row
            r = (acc + step) % jnp.maximum(wcur, 1)
            head = mread(r)
            val = (head ^ b0.astype(jnp.int32) ^ acc) & 0x7fffffff
            # masked write one value per lane
            mwrite(wcur % V, val, jnp.full((8, 128), True))
            acc = acc + (val & 7)
            return step + 1, rp % R, wcur + 1, b0, b1, avail, acc

        def cond(c):
            return (c[0] < steps) & jnp.any(c[6] >= 0)

        z = jnp.zeros((8, 128), jnp.int32)
        init = (jnp.int32(0), z, z, z.astype(jnp.uint32),
                z.astype(jnp.uint32), z + 96, z)
        out = jax.lax.while_loop(cond, body, init)
        diag_ref[0] = out[6]
        diag_ref[1] = out[2]

    @jax.jit
    def f(col):
        return pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct((V, 8, 128), jnp.int32),
                       jax.ShapeDtypeStruct((2, 8, 128), jnp.int32)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM)),
            interpret=interpret,
        )(col)

    return f


def timeit(f, *a, reps=5):
    np.asarray(f(*a)[1])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(f(*a)[1][0, :1, :1]))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


if __name__ == "__main__":
    col = jnp.asarray(
        np.random.randint(0, 1 << 30, (R, 8, 128)).astype(np.int32))
    print("devices:", jax.devices())
    for steps in (100, 1100):
        try:
            f = build(steps)
            dt = timeit(f, col)
            print(f"OK steps={steps}: {dt*1e3:8.3f} ms")
        except Exception as e:
            print(f"FAIL steps={steps}: {type(e).__name__}: "
                  + str(e).split(chr(10))[0][:300])
