"""Probe 9: remove probe6 pieces one at a time to find the poison combo."""
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, V, STEPS = 64, 640, 200


def build(use_refill, use_shift, use_read, use_write):
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
            if use_refill:
                need = avail <= 64
                w = mload(jnp.where(need, rp, R + 1)).astype(jnp.uint32)
                b1 = jnp.where(need, b1 | (w >> 16), b1)
                avail = jnp.where(need, avail + 32, avail)
                rp = jnp.where(need, rp + 1, rp)
            if use_shift:
                k = (b1 & 7).astype(jnp.int32) + 1
                b0 = (b0 << k.astype(jnp.uint32)) | (b1 >> (32 - k).astype(jnp.uint32))
                b1 = b1 << k.astype(jnp.uint32)
                avail = avail - k
            val = b0.astype(jnp.int32) ^ acc
            if use_read:
                r = (acc + step) % jnp.maximum(wcur, 1)
                head = mread(r)
                val = (head ^ val) & 0x7fffffff
            if use_write:
                mwrite(wcur % V, val, jnp.full((8, 128), True))
            acc = acc + (val & 7)
            return step + 1, rp % R, wcur + 1, b0, b1, avail, acc

        def cond(c):
            return (c[0] < STEPS) & jnp.any(c[6] >= 0)

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
        )(col)

    return f


if __name__ == "__main__":
    col = jnp.asarray(
        np.random.randint(0, 1 << 30, (R, 8, 128)).astype(np.int32))
    print("devices:", jax.devices())
    combos = [
        ("all", True, True, True, True),
        ("no refill", False, True, True, True),
        ("no shift", True, False, True, True),
        ("no read", True, True, False, True),
        ("no write", True, True, True, False),
        ("refill+shift only", True, True, False, False),
        ("read+write only", False, False, True, True),
    ]
    for name, *flags in combos:
        try:
            f = build(*flags)
            r = np.asarray(f(col)[1])
            print(f"OK   {name}  (sum {r.sum() & 0xffffffff})")
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: "
                  + str(e).split(chr(10))[0][:160])
