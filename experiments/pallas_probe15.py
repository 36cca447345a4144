"""Probe 15: which exact data-dependence crashes the masked-load loop?

r1: data-dep self-advancing index, direct load
r2: step-dep index, where(data-dep cond) index select
r3: where(data-dep cond) conditional index advance, direct load
r4: buffer ALSO written each iteration (probe9 read+write style), data-dep idx
"""
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, STEPS = 64, 200


def run(name, variant):
    def kernel(col_ref, out_ref, scr):
        rows_r = jax.lax.broadcasted_iota(jnp.int32, (R, 8, 128), 0)
        scr[:] = col_ref[:]

        def mload(rp):
            m = rows_r == rp[None]
            return jnp.sum(jnp.where(m, scr[:], 0), axis=0)

        def body(c):
            step, rp, acc = c
            if variant == "r1":
                w = mload(rp)
                rp = (rp + (w & 1) + 1) % R
            elif variant == "r2":
                cond_d = (acc & 1) == 0
                w = mload(jnp.where(cond_d, rp, -1))
                rp = (rp + 1) % R
            elif variant == "r3":
                w = mload(rp)
                need = (w & 1) == 0
                rp = jnp.where(need, rp + 1, rp) % R
            elif variant == "r4":
                w = mload(rp)
                m = rows_r == ((rp + 7) % R)[None]
                scr[:] = jnp.where(m, (w + 1)[None], scr[:])
                rp = (rp + (w & 1) + 1) % R
            acc = acc + w
            return step + 1, rp, acc

        def cond(c):
            return (c[0] < STEPS) & jnp.any(c[2] > -(1 << 30))

        z = jnp.zeros((8, 128), jnp.int32)
        out = jax.lax.while_loop(cond, body, (jnp.int32(0), z, z))
        out_ref[:] = out[2]

    col = jnp.asarray(
        np.random.randint(0, 1 << 20, (R, 8, 128)).astype(np.int32))

    @jax.jit
    def f(col):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((R, 8, 128), jnp.int32)],
        )(col)

    try:
        r = np.asarray(f(col))
        print(f"OK   {name}  (sum {r.sum() & 0xffffffff})", flush=True)
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: "
              + str(e).split(chr(10))[0][:120], flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices())
    for v in ("r1", "r2", "r3", "r4"):
        run(v, v)
