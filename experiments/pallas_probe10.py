"""Probe 10: workarounds for the refill+shift Mosaic failure (probe9)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, V, STEPS = 64, 640, 200


def build(variant):
    def kernel(col_ref, out_ref):
        out_ref[:] = jnp.zeros((V, 8, 128), jnp.int32)
        rows_r = jax.lax.broadcasted_iota(jnp.int32, (R, 8, 128), 0)

        def mload_sum(rp):
            m = rows_r == rp[None]
            return jnp.sum(jnp.where(m, col_ref[:], 0), axis=0)

        def mload_fori(rp):
            def body(i, acc):
                return acc + jnp.where(rp == i, col_ref[i], 0)
            return jax.lax.fori_loop(0, R, body, jnp.zeros((8, 128), jnp.int32))

        def mload_max(rp):
            m = rows_r == rp[None]
            return jnp.max(jnp.where(m, col_ref[:], 0), axis=0)

        def body(c):
            step, rp, b0, b1, avail, acc = c
            need = avail <= 64
            if variant == "fori":
                w = mload_fori(jnp.where(need, rp, R + 1))
            elif variant == "max":
                w = mload_max(jnp.where(need, rp, R + 1))
            else:
                w = mload_sum(jnp.where(need, rp, R + 1))
            if variant == "barrier":
                w = jax.lax.optimization_barrier(w)
            w = w.astype(jnp.uint32)
            b1 = jnp.where(need, b1 | (w >> 16), b1)
            avail = jnp.where(need, avail + 32, avail)
            rp = jnp.where(need, rp + 1, rp)
            k = (b1 & 7).astype(jnp.int32) + 1
            if variant == "barrier_k":
                k = jax.lax.optimization_barrier(k)
            b0 = (b0 << k.astype(jnp.uint32)) | (b1 >> (32 - k).astype(jnp.uint32))
            b1 = b1 << k.astype(jnp.uint32)
            avail = avail - k
            acc = acc + b0.astype(jnp.int32)
            return step + 1, rp % R, b0, b1, avail, acc

        def cond(c):
            return (c[0] < STEPS) & jnp.any(c[5] < (1 << 30))

        z = jnp.zeros((8, 128), jnp.int32)
        init = (jnp.int32(0), z, z.astype(jnp.uint32),
                z.astype(jnp.uint32), z + 96, z)
        out = jax.lax.while_loop(cond, body, init)
        out_ref[0] = out[5]

    @jax.jit
    def f(col):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((V, 8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(col)

    return f


if __name__ == "__main__":
    col = jnp.asarray(
        np.random.randint(0, 1 << 30, (R, 8, 128)).astype(np.int32))
    print("devices:", jax.devices())
    for variant in ("sum", "barrier", "barrier_k", "fori", "max"):
        try:
            f = build(variant)
            r = np.asarray(f(col))
            print(f"OK   {variant}  (sum {r.sum() & 0xffffffff})")
        except Exception as e:
            print(f"FAIL {variant}: {type(e).__name__}: "
                  + str(e).split(chr(10))[0][:160])
