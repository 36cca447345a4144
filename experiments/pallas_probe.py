"""Probe: does Pallas work on this chip, and which in-kernel gather forms lower?

Run: timeout 600 python experiments/pallas_probe.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(f, *a, reps=5):
    r = f(*a)
    jax.block_until_ready(r)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*a))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2], r


def probe(name, fn):
    try:
        dt, r = fn()
        print(f"OK   {name}: {dt*1e3:.3f} ms  (result checksum {int(np.asarray(r).sum()) & 0xffffffff})")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:300]
        print(f"FAIL {name}: {type(e).__name__}: {msg}")
        return False


# ---------------------------------------------------------------- 1. trivial
def trivial():
    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2

    x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)

    @jax.jit
    def f(x):
        return pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    return timeit(f, x)


# ------------------------------------------- 2. fori_loop + take_along_axis
W = 4096
STEPS = 1000


def gather_sublane():
    def k(tbl_ref, idx_ref, o_ref):
        tbl = tbl_ref[:]

        def body(i, acc):
            idx = (idx_ref[:] + acc) & (W - 1)
            v = jnp.take_along_axis(tbl, idx, axis=0)
            return acc + v

        o_ref[:] = jax.lax.fori_loop(0, STEPS, body,
                                     jnp.zeros((8, 128), jnp.int32))

    tbl = jnp.asarray(np.random.randint(0, 7, (W, 128)), dtype=jnp.int32)
    idx = jnp.asarray(np.random.randint(0, W, (8, 128)), dtype=jnp.int32)

    @jax.jit
    def f(tbl, idx):
        return pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tbl, idx)

    return timeit(f, tbl, idx)


# ------------------------------------------- 3. gather from ref (not value)
def gather_ref():
    def k(tbl_ref, idx_ref, o_ref):
        def body(i, acc):
            idx = (idx_ref[:] + acc) & (W - 1)
            v = jnp.take_along_axis(tbl_ref[:], idx, axis=0)
            return acc + v

        o_ref[:] = jax.lax.fori_loop(0, STEPS, body,
                                     jnp.zeros((8, 128), jnp.int32))

    tbl = jnp.asarray(np.random.randint(0, 7, (W, 128)), dtype=jnp.int32)
    idx = jnp.asarray(np.random.randint(0, W, (8, 128)), dtype=jnp.int32)

    @jax.jit
    def f(tbl, idx):
        return pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tbl, idx)

    return timeit(f, tbl, idx)


# --------------------------- 4. 1-D table gather (jnp.take) w/ 2-D indices
def gather_1d():
    def k(tbl_ref, idx_ref, o_ref):
        tbl = tbl_ref[:]

        def body(i, acc):
            idx = (idx_ref[:] + acc) & (W - 1)
            v = jnp.take(tbl.reshape(-1), idx, axis=0)
            return acc + v

        o_ref[:] = jax.lax.fori_loop(0, STEPS, body,
                                     jnp.zeros((8, 128), jnp.int32))

    tbl = jnp.asarray(np.random.randint(0, 7, (W, 1)), dtype=jnp.int32)
    idx = jnp.asarray(np.random.randint(0, W, (8, 128)), dtype=jnp.int32)

    @jax.jit
    def f(tbl, idx):
        return pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tbl, idx)

    return timeit(f, tbl, idx)


# ---------------------------- 5. pure VPU loop baseline (no gather), same steps
def vpu_loop():
    def k(idx_ref, o_ref):
        def body(i, acc):
            v = (idx_ref[:] * acc + 12345) >> 3
            return acc + (v & 7)

        o_ref[:] = jax.lax.fori_loop(0, STEPS, body,
                                     jnp.zeros((8, 128), jnp.int32))

    idx = jnp.asarray(np.random.randint(0, W, (8, 128)), dtype=jnp.int32)

    @jax.jit
    def f(idx):
        return pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx)

    return timeit(f, idx)


# -------- 6. bigger state: 32x128 lanes with per-lane gather (lane scaling)
def gather_32():
    def k(tbl_ref, idx_ref, o_ref):
        tbl = tbl_ref[:]

        def body(i, acc):
            idx = (idx_ref[:] + acc) & (W - 1)
            v = jnp.take_along_axis(tbl, idx, axis=0)
            return acc + v

        o_ref[:] = jax.lax.fori_loop(0, STEPS, body,
                                     jnp.zeros((32, 128), jnp.int32))

    tbl = jnp.asarray(np.random.randint(0, 7, (W, 128)), dtype=jnp.int32)
    idx = jnp.asarray(np.random.randint(0, W, (32, 128)), dtype=jnp.int32)

    @jax.jit
    def f(tbl, idx):
        return pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((32, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tbl, idx)

    return timeit(f, tbl, idx)


if __name__ == "__main__":
    print("devices:", jax.devices())
    probe("trivial kernel", trivial)
    probe("vpu loop 1000 steps (no gather)", vpu_loop)
    probe("take_along_axis sublane gather in fori_loop (8x128)", gather_sublane)
    probe("same but indexing ref each step", gather_ref)
    probe("1-D jnp.take gather in fori_loop", gather_1d)
    probe("take_along_axis gather (32x128 lanes)", gather_32)
