"""Probe 14: is the crash specific to masked loads from a read-only INPUT?

q8 copies the input column into VMEM scratch at kernel start and masked-reads
the scratch instead — if that passes, the decode kernel just stages its
stream column through scratch.
"""
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, STEPS = 64, 200


def run(name, use_scratch, data_dep_avail):
    def kernel(col_ref, out_ref, scr):
        rows_r = jax.lax.broadcasted_iota(jnp.int32, (R, 8, 128), 0)
        if use_scratch:
            scr[:] = col_ref[:]
            src = scr
        else:
            src = col_ref

        def mload(rp):
            m = rows_r == rp[None]
            return jnp.sum(jnp.where(m, src[:], 0), axis=0)

        def body(c):
            step, rp, b0, b1, avail = c
            need = avail <= 64
            w = mload(jnp.where(need, rp, R + 1)).astype(jnp.uint32)
            b1 = jnp.where(need, b1 | w, b1)
            avail = jnp.where(need, avail + 32, avail)
            rp = jnp.where(need, rp + 1, rp)
            k = (b1 & jnp.uint32(7)).astype(jnp.int32) + 1
            b0 = b0 + (b1 << k.astype(jnp.uint32))
            if data_dep_avail:
                avail = avail - k
            else:
                avail = avail - 4 - (step % 3)
            return step + 1, rp % R, b0, b1, avail

        def cond(c):
            return (c[0] < STEPS) & jnp.any(c[4] > -(1 << 30))

        z = jnp.zeros((8, 128), jnp.int32)
        out = jax.lax.while_loop(
            cond, body, (jnp.int32(0), z, z.astype(jnp.uint32),
                         z.astype(jnp.uint32), z + 96))
        out_ref[:] = out[2].astype(jnp.int32)

    col = jnp.asarray(
        np.random.randint(0, 1 << 30, (R, 8, 128)).astype(np.int32))

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
    run("q8  scratch copy + data-dep avail", True, True)
    run("q6  input + step-dep avail", False, False)
    run("q9  scratch copy + step-dep avail", True, False)
    run("q10 input + data-dep avail (control=FAIL)", False, True)
