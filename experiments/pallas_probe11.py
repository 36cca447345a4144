"""Probe 11: minimal reproduction matrix for the refill+shift Mosaic crash."""
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, STEPS = 64, 200


def run(name, body_fn, n_carry=3):
    """body_fn(w_loaded, b0, b1) -> (b0, b1); carries are uint32."""
    def kernel(col_ref, out_ref):
        rows_r = jax.lax.broadcasted_iota(jnp.int32, (R, 8, 128), 0)

        def mload(rp):
            m = rows_r == rp[None]
            return jnp.sum(jnp.where(m, col_ref[:], 0), axis=0)

        def body(c):
            step, rp, b0, b1 = c
            w = mload(rp).astype(jnp.uint32)
            b0, b1 = body_fn(w, b0, b1)
            return step + 1, (rp + 1) % R, b0, b1

        def cond(c):
            return (c[0] < STEPS) & jnp.any(c[2] < jnp.uint32(0xffffffff))

        z = jnp.zeros((8, 128), jnp.uint32)
        out = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.zeros((8, 128), jnp.int32), z, z))
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
        )(col)

    try:
        r = np.asarray(f(col))
        print(f"OK   {name}  (sum {r.sum() & 0xffffffff})")
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: "
              + str(e).split(chr(10))[0][:120])


def v1_shift_by_loaded(w, b0, b1):
    k = (w & jnp.uint32(7)) + 1
    return (b0 << k) | w, b1


def v2_shift_by_carry_mixed(w, b0, b1):
    b1 = b1 | w
    k = (b1 & jnp.uint32(7)) + 1
    return (b0 << k) | jnp.uint32(1), b1


def v3_no_varshift(w, b0, b1):
    b1 = b1 | w
    k = (b1 & jnp.uint32(7)) + 1
    return b0 + k * k, b1


def v4_varshift_const_amount(w, b0, b1):
    b1 = b1 | w
    return (b0 << jnp.uint32(3)) | (b1 >> jnp.uint32(16)), b1


def v5_varshift_int32(w, b0, b1):
    b1 = b1 | w
    k = (b1 & jnp.uint32(7)).astype(jnp.int32) + 1
    r = jax.lax.shift_left(b1.astype(jnp.int32), k)
    return b0 + r.astype(jnp.uint32), b1


def v6_unrolled_select_shift(w, b0, b1):
    b1 = b1 | w
    k = (b1 & jnp.uint32(7)).astype(jnp.int32) + 1
    r = jnp.zeros_like(b0)
    for kk in range(1, 9):
        r = jnp.where(k == kk, b0 << jnp.uint32(kk), r)
    return r | jnp.uint32(1), b1


def v7_shift_of_unloaded_by_loaded(w, b0, b1):
    k = (w & jnp.uint32(7)) + 1
    b1 = b1 + jnp.uint32(1)
    return (b1 << k) | b0, b1


if __name__ == "__main__":
    print("devices:", jax.devices())
    run("v3 no varshift (control)", v3_no_varshift)
    run("v4 const-amount shift of loaded", v4_varshift_const_amount)
    run("v1 shift by loaded amount", v1_shift_by_loaded)
    run("v2 shift by carry|loaded amount", v2_shift_by_carry_mixed)
    run("v5 int32 lax.shift_left", v5_varshift_int32)
    run("v6 unrolled select shift", v6_unrolled_select_shift)
    run("v7 shift unloaded val by loaded amount", v7_shift_of_unloaded_by_loaded)
