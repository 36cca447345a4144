"""Probe 7: bisect probe6's Mosaic compile failure."""
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
STEPS = 200


def run(name, kernel, n_out=1):
    col = jnp.asarray(
        np.random.randint(0, 1 << 30, (R, 8, 128)).astype(np.int32))

    @jax.jit
    def f(col):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((V, 8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(col)

    try:
        r = np.asarray(f(col))
        print(f"OK   {name}  (sum {r.sum() & 0xffffffff})")
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: "
              + str(e).split(chr(10))[0][:160])


def k_while_refwrite(col_ref, out_ref):
    """while_loop body mutates out_ref at a static row."""
    out_ref[:] = jnp.zeros((V, 8, 128), jnp.int32)

    def body(c):
        step, acc = c
        out_ref[0] = acc[None][0]
        return step + 1, acc + 1

    def cond(c):
        return (c[0] < STEPS) & jnp.any(c[1] < 10**9)

    jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.zeros((8, 128), jnp.int32)))


def k_while_maskedwrite(col_ref, out_ref):
    """while_loop body with masked (V,8,128) RMW write."""
    out_ref[:] = jnp.zeros((V, 8, 128), jnp.int32)
    rows_v = jax.lax.broadcasted_iota(jnp.int32, (V, 8, 128), 0)

    def body(c):
        step, acc = c
        m = rows_v == (acc % V)[None]
        out_ref[:] = jnp.where(m, acc[None], out_ref[:])
        return step + 1, acc + 1

    def cond(c):
        return (c[0] < STEPS) & jnp.any(c[1] < 10**9)

    jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.zeros((8, 128), jnp.int32)))


def k_fori_maskedwrite(col_ref, out_ref):
    """same but fori_loop."""
    out_ref[:] = jnp.zeros((V, 8, 128), jnp.int32)
    rows_v = jax.lax.broadcasted_iota(jnp.int32, (V, 8, 128), 0)

    def body(i, acc):
        m = rows_v == (acc % V)[None]
        out_ref[:] = jnp.where(m, acc[None], out_ref[:])
        return acc + 1

    jax.lax.fori_loop(0, STEPS, body, jnp.zeros((8, 128), jnp.int32))


def k_while_maskedsum_col(col_ref, out_ref):
    """while_loop body with masked-sum load from col_ref."""
    out_ref[:] = jnp.zeros((V, 8, 128), jnp.int32)
    rows_r = jax.lax.broadcasted_iota(jnp.int32, (R, 8, 128), 0)

    def body(c):
        step, acc = c
        m = rows_r == (acc % R)[None]
        w = jnp.sum(jnp.where(m, col_ref[:], 0), axis=0)
        return step + 1, acc + (w & 7)

    def cond(c):
        return (c[0] < STEPS) & jnp.any(c[1] < 10**9)

    _, acc = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.zeros((8, 128), jnp.int32)))
    out_ref[0] = acc[None][0]


def k_while_maskedread_out(col_ref, out_ref):
    """while_loop body reads out_ref back with masked-sum (RMW feedback)."""
    out_ref[:] = jnp.zeros((V, 8, 128), jnp.int32)
    rows_v = jax.lax.broadcasted_iota(jnp.int32, (V, 8, 128), 0)

    def body(c):
        step, acc = c
        m = rows_v == (acc % V)[None]
        head = jnp.sum(jnp.where(m, out_ref[:], 0), axis=0)
        out_ref[:] = jnp.where(m, (head + acc)[None], out_ref[:])
        return step + 1, acc + 1

    def cond(c):
        return (c[0] < STEPS) & jnp.any(c[1] < 10**9)

    jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.zeros((8, 128), jnp.int32)))


def k_uintshift_while(col_ref, out_ref):
    """uint32 variable shifts inside while_loop."""
    out_ref[:] = jnp.zeros((V, 8, 128), jnp.int32)

    def body(c):
        step, b0, b1 = c
        k = (b1 & jnp.uint32(7)) + 1
        b0 = (b0 << k) | (b1 >> (jnp.uint32(32) - k))
        b1 = (b1 << k) | b0
        return step + 1, b0, b1

    def cond(c):
        return (c[0] < STEPS) & jnp.any(c[1] < jnp.uint32(1 << 31))

    _, b0, _ = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), jnp.full((8, 128), 3, jnp.uint32),
         jnp.full((8, 128), 5, jnp.uint32)))
    out_ref[0] = b0.astype(jnp.int32)[None][0]


if __name__ == "__main__":
    print("devices:", jax.devices())
    run("while + static ref write", k_while_refwrite)
    run("while + masked RMW write", k_while_maskedwrite)
    run("fori  + masked RMW write", k_fori_maskedwrite)
    run("while + masked-sum col load", k_while_maskedsum_col)
    run("while + masked read+write out", k_while_maskedread_out)
    run("while + uint32 var shifts", k_uintshift_while)
