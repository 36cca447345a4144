"""Probe 12: probe11-v1 (passes) + probe10 elements one at a time."""
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, STEPS = 64, 200


def run(name, body_fn):
    """body_fn(mload, c) -> c; carry c = (step, rp, b0, b1, avail)."""
    def kernel(col_ref, out_ref):
        rows_r = jax.lax.broadcasted_iota(jnp.int32, (R, 8, 128), 0)

        def mload(rp):
            m = rows_r == rp[None]
            return jnp.sum(jnp.where(m, col_ref[:], 0), axis=0)

        def body(c):
            return body_fn(mload, c)

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
        )(col)

    try:
        r = np.asarray(f(col))
        print(f"OK   {name}  (sum {r.sum() & 0xffffffff})", flush=True)
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: "
              + str(e).split(chr(10))[0][:120], flush=True)


def p1_shiftpair(mload, c):
    step, rp, b0, b1, avail = c
    w = mload(rp).astype(jnp.uint32)
    b1 = b1 | w
    k = (b1 & jnp.uint32(7)) + 1
    b0 = (b0 << k) | (b1 >> (jnp.uint32(32) - k))
    b1 = b1 << k
    return step + 1, (rp + 1) % R, b0, b1, avail


def p2_condrefill(mload, c):
    step, rp, b0, b1, avail = c
    need = avail <= 64
    w = mload(jnp.where(need, rp, R + 1)).astype(jnp.uint32)
    b1 = jnp.where(need, b1 | w, b1)
    avail = jnp.where(need, avail + 32, avail)
    rp = jnp.where(need, rp + 1, rp)
    k = (b1 & jnp.uint32(7)).astype(jnp.int32) + 1
    b0 = b0 + (b1 << k.astype(jnp.uint32))
    avail = avail - k
    return step + 1, rp % R, b0, b1, avail


def p3_both(mload, c):
    step, rp, b0, b1, avail = c
    need = avail <= 64
    w = mload(jnp.where(need, rp, R + 1)).astype(jnp.uint32)
    b1 = jnp.where(need, b1 | w, b1)
    avail = jnp.where(need, avail + 32, avail)
    rp = jnp.where(need, rp + 1, rp)
    k = (b1 & jnp.uint32(7)) + 1
    b0 = (b0 << k) | (b1 >> (jnp.uint32(32) - k))
    b1 = b1 << k
    avail = avail - k.astype(jnp.int32)
    return step + 1, rp % R, b0, b1, avail


def p4_pair_int32amount(mload, c):
    step, rp, b0, b1, avail = c
    need = avail <= 64
    w = mload(jnp.where(need, rp, R + 1)).astype(jnp.uint32)
    b1 = jnp.where(need, b1 | w, b1)
    avail = jnp.where(need, avail + 32, avail)
    rp = jnp.where(need, rp + 1, rp)
    k = (b1 & jnp.uint32(7)).astype(jnp.int32) + 1
    b0 = (b0 << k.astype(jnp.uint32)) | (b1 >> (32 - k).astype(jnp.uint32))
    b1 = b1 << k.astype(jnp.uint32)
    avail = avail - k
    return step + 1, rp % R, b0, b1, avail


if __name__ == "__main__":
    print("devices:", jax.devices())
    run("p1 shift-pair, k from loaded", p1_shiftpair)
    run("p2 cond refill, single shift", p2_condrefill)
    run("p3 cond refill + shift pair (uint k)", p3_both)
    run("p4 cond refill + shift pair (int k cast)", p4_pair_int32amount)
