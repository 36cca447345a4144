"""Probe 8: narrow probe6's failing construct."""
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, V, STEPS = 64, 640, 200


def run(name, kernel, two_out=False):
    col = jnp.asarray(
        np.random.randint(0, 1 << 30, (R, 8, 128)).astype(np.int32))
    if two_out:
        out_shape = (jax.ShapeDtypeStruct((V, 8, 128), jnp.int32),
                     jax.ShapeDtypeStruct((2, 8, 128), jnp.int32))
        out_specs = (pl.BlockSpec(memory_space=pltpu.VMEM),
                     pl.BlockSpec(memory_space=pltpu.VMEM))
    else:
        out_shape = jax.ShapeDtypeStruct((V, 8, 128), jnp.int32)
        out_specs = pl.BlockSpec(memory_space=pltpu.VMEM)

    @jax.jit
    def f(col):
        return pl.pallas_call(kernel, out_shape=out_shape,
                              in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                              out_specs=out_specs)(col)

    try:
        r = f(col)
        r = np.asarray(r[0] if two_out else r)
        print(f"OK   {name}  (sum {r.sum() & 0xffffffff})")
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: "
              + str(e).split(chr(10))[0][:160])


def k_vec_mod_vec(col_ref, out_ref):
    out_ref[:] = jnp.zeros((V, 8, 128), jnp.int32)

    def body(c):
        step, acc, w = c
        r = (acc + step) % jnp.maximum(w, 1)
        return step + 1, acc + r, w + 1

    def cond(c):
        return (c[0] < STEPS) & jnp.any(c[1] < 10**9)

    _, acc, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.zeros((8, 128), jnp.int32),
                     jnp.ones((8, 128), jnp.int32)))
    out_ref[0] = acc[None][0]


def k_scalar_bcast(col_ref, out_ref):
    out_ref[:] = jnp.zeros((V, 8, 128), jnp.int32)

    def body(c):
        step, acc = c
        return step + 1, acc + step

    def cond(c):
        return (c[0] < STEPS) & jnp.any(c[1] < 10**9)

    _, acc = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.zeros((8, 128), jnp.int32)))
    out_ref[0] = acc[None][0]


def k_two_outputs(col_ref, out_ref, diag_ref):
    out_ref[:] = jnp.zeros((V, 8, 128), jnp.int32)

    def body(c):
        step, acc = c
        return step + 1, acc + 1

    def cond(c):
        return (c[0] < STEPS) & jnp.any(c[1] < 10**9)

    _, acc = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.zeros((8, 128), jnp.int32)))
    diag_ref[0] = acc
    diag_ref[1] = acc
    out_ref[0] = acc[None][0]


def k_mixed_carry_dtypes(col_ref, out_ref):
    out_ref[:] = jnp.zeros((V, 8, 128), jnp.int32)

    def body(c):
        step, b0, avail, acc = c
        k = (b0 & jnp.uint32(7)).astype(jnp.int32) + 1
        b0 = b0 << k.astype(jnp.uint32)
        avail = avail - k
        need = avail <= 64
        avail = jnp.where(need, avail + 32, avail)
        b0 = jnp.where(need, b0 | jnp.uint32(0x9e3779b9), b0)
        return step + 1, b0, avail, acc + (b0 & jnp.uint32(7)).astype(jnp.int32)

    def cond(c):
        return (c[0] < STEPS) & jnp.any(c[3] < 10**9)

    _, _, _, acc = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.full((8, 128), 12345, jnp.uint32),
                     jnp.full((8, 128), 96, jnp.int32),
                     jnp.zeros((8, 128), jnp.int32)))
    out_ref[0] = acc[None][0]


def k_shift_by_32_minus(col_ref, out_ref):
    """b1 >> (32-k) as uint32 where k in 1..8 -> shift in 24..31 (safe)."""
    out_ref[:] = jnp.zeros((V, 8, 128), jnp.int32)

    def body(c):
        step, b0, b1 = c
        k = ((b1 & jnp.uint32(7)) + 1).astype(jnp.int32)
        b0 = (b0 << k.astype(jnp.uint32)) | (b1 >> (32 - k).astype(jnp.uint32))
        b1 = b1 << k.astype(jnp.uint32)
        return step + 1, b0, b1

    def cond(c):
        return (c[0] < STEPS) & jnp.any(c[1] < jnp.uint32(1 << 31))

    _, b0, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.full((8, 128), 3, jnp.uint32),
                     jnp.full((8, 128), 0x12345678, jnp.uint32)))
    out_ref[0] = b0.astype(jnp.int32)[None][0]


if __name__ == "__main__":
    print("devices:", jax.devices())
    run("vector %% vector in while", k_vec_mod_vec)
    run("scalar step broadcast into vec carry", k_scalar_bcast)
    run("two outputs (tuple out_shape)", k_two_outputs, two_out=True)
    run("mixed uint32/int32 carry + where", k_mixed_carry_dtypes)
    run("shift by (32-k)", k_shift_by_32_minus)
