"""Probe 5: kernel primitives needed by the BVGraph decode kernel.

clz / variable shifts / while_loop / uint32 / dynamic_gather uint32 /
scalar-indexed VMEM scratch / in-kernel DMA from HBM at dynamic offset.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, build):
    try:
        out, expect = build()
        out = np.asarray(out)
        ok = np.array_equal(out, expect) if expect is not None else True
        print(f"{'OK  ' if ok else 'WRONG'} {name}" +
              ("" if ok else f": got {out.ravel()[:8]} want {np.asarray(expect).ravel()[:8]}"))
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"FAIL {name}: {type(e).__name__}: {msg}")


def simple(k, *inputs, out_shape, scratch_shapes=()):
    @jax.jit
    def f(*xs):
        return pl.pallas_call(
            k,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(xs),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=list(scratch_shapes),
        )(*xs)
    return f(*inputs)


def t_clz():
    x = np.random.randint(1, 1 << 30, (8, 128)).astype(np.int32)

    def k(x_ref, o_ref):
        o_ref[:] = jax.lax.clz(x_ref[:])

    out = simple(k, jnp.asarray(x),
                 out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32))
    expect = 32 - np.frexp(x.astype(np.float64))[1].astype(np.int32)
    # frexp exponent: x in [2^(e-1), 2^e) -> clz = 32 - e
    return out, expect


def t_varshift():
    x = np.random.randint(0, 1 << 16, (8, 128)).astype(np.uint32)
    s = np.random.randint(0, 15, (8, 128)).astype(np.uint32)

    def k(x_ref, s_ref, o_ref):
        o_ref[:] = (x_ref[:] << s_ref[:]) | (x_ref[:] >> (s_ref[:] + 1))

    out = simple(k, jnp.asarray(x), jnp.asarray(s),
                 out_shape=jax.ShapeDtypeStruct((8, 128), jnp.uint32))
    expect = ((x << s) | (x >> (s + 1))).astype(np.uint32)
    return out, expect


def t_while():
    x = np.random.randint(1, 100, (8, 128)).astype(np.int32)

    def k(x_ref, o_ref):
        def cond(c):
            i, acc = c
            return jnp.max(acc) < 1000

        def body(c):
            i, acc = c
            return i + 1, acc + x_ref[:]

        i, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), x_ref[:]))
        o_ref[:] = acc + i

    out = simple(k, jnp.asarray(x),
                 out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32))
    acc = x.copy()
    i = 0
    while acc.max() < 1000:
        acc += x
        i += 1
    return out, acc + i


def t_dyngather_u32():
    x = np.random.randint(0, 1 << 31, (8, 128)).astype(np.uint32)
    idx = np.random.randint(0, 8, (8, 128)).astype(np.int32)

    def k(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)

    out = simple(k, jnp.asarray(x), jnp.asarray(idx),
                 out_shape=jax.ShapeDtypeStruct((8, 128), jnp.uint32))
    expect = np.take_along_axis(x, idx, axis=0)
    return out, expect


def t_scratch_dyn():
    """VMEM scratch tile store/load at scalar dynamic index."""
    x = np.random.randint(0, 100, (8, 128)).astype(np.int32)

    def k(x_ref, o_ref, scr):
        def body(i, _):
            scr[pl.ds(i, 1)] = (x_ref[:] + i)[None]
            return 0

        jax.lax.fori_loop(0, 16, body, 0)
        acc = jnp.zeros((8, 128), jnp.int32)

        def body2(i, acc):
            return acc + scr[pl.ds(i, 1)][0]

        o_ref[:] = jax.lax.fori_loop(0, 16, body2, acc)

    out = simple(k, jnp.asarray(x),
                 out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
                 scratch_shapes=[pltpu.VMEM((16, 8, 128), jnp.int32)])
    expect = 16 * x + sum(range(16))
    return out, expect


def t_dma_dynoffset():
    """DMA HBM->VMEM at a data-dependent scalar offset inside fori_loop."""
    T = 64
    x = np.random.randint(0, 100, (T, 8, 128)).astype(np.int32)

    def k(hbm_ref, o_ref):
        def body(scr, sem):
            acc = jnp.zeros((8, 128), jnp.int32)

            def step(i, acc):
                off = (i * 7) % (T - 4)
                dma = pltpu.make_async_copy(
                    hbm_ref.at[pl.ds(off, 4)], scr, sem)
                dma.start()
                dma.wait()
                return acc + scr[0] + scr[3]

            acc = jax.lax.fori_loop(0, 8, step, acc)
            o_ref[:] = acc

        pl.run_scoped(body, scr=pltpu.VMEM((4, 8, 128), jnp.int32),
                      sem=pltpu.SemaphoreType.DMA(()))

    @jax.jit
    def f(x):
        return pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    out = f(jnp.asarray(x))
    expect = np.zeros((8, 128), np.int32)
    for i in range(8):
        off = (i * 7) % (T - 4)
        expect += x[off] + x[off + 3]
    return out, expect


def t_u32_cmp_mix():
    """uint32 compares + int32 where-mixes (state machine staples)."""
    a = np.random.randint(0, 1 << 31, (8, 128)).astype(np.uint32)
    b = np.random.randint(0, 1 << 31, (8, 128)).astype(np.uint32)

    def k(a_ref, b_ref, o_ref):
        a, b = a_ref[:], b_ref[:]
        m = a < b
        o_ref[:] = jnp.where(m, (a >> jnp.uint32(3)).astype(jnp.int32),
                             -(b & jnp.uint32(7)).astype(jnp.int32))

    out = simple(k, jnp.asarray(a), jnp.asarray(b),
                 out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32))
    expect = np.where(a < b, (a >> 3).astype(np.int32),
                      -(b & 7).astype(np.int32))
    return out, expect


if __name__ == "__main__":
    run("clz int32", t_clz)
    run("variable shifts uint32", t_varshift)
    run("while_loop vector state", t_while)
    run("dynamic_gather uint32 (8,128)", t_dyngather_u32)
    run("VMEM scratch dynamic-index tiles", t_scratch_dyn)
    run("DMA HBM->VMEM dynamic offset in loop", t_dma_dynoffset)
    run("uint32 compares / where mix", t_u32_cmp_mix)
