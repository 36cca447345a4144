"""Probe 3: find the slow-completion threshold; does it apply to XLA ops too?"""
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
    return sorted(ts)[len(ts) // 2]


def loop_kernel(steps, shape=(8, 128)):
    def k(x_ref, o_ref):
        x = x_ref[:]

        def body(i, acc):
            return acc + x

        o_ref[:] = jax.lax.fori_loop(0, steps, body,
                                     jnp.zeros(shape, jnp.int32))

    x = jnp.asarray(np.random.randint(1, 5, shape), dtype=jnp.int32)

    @jax.jit
    def f(x):
        return pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    return timeit(f, x)


def matmul_chain(size, chain):
    a = jnp.asarray(np.random.randn(size, size), dtype=jnp.bfloat16)

    @jax.jit
    def f(a):
        x = a
        for _ in range(chain):
            x = jnp.dot(x, a, preferred_element_type=jnp.bfloat16)
            x = x / jnp.max(jnp.abs(x))
        return x

    return timeit(f, a)


def many_dispatches(k):
    """k separate small dispatches, one sync at the end."""
    a = jnp.ones((256, 256), jnp.float32)
    f = jax.jit(lambda x: x * 1.00001 + 1.0)
    f(a).block_until_ready()
    t0 = time.perf_counter()
    x = a
    for _ in range(k):
        x = f(x)
    x.block_until_ready()
    return time.perf_counter() - t0


if __name__ == "__main__":
    for steps in (200, 400, 600, 800, 1000, 2000, 100000):
        print(f"pallas loop {steps:>7} steps: {loop_kernel(steps)*1e3:8.3f} ms")
    for size, chain in ((1024, 1), (2048, 4), (4096, 8), (4096, 32), (8192, 32)):
        print(f"xla matmul {size}x{size} x{chain}: {matmul_chain(size, chain)*1e3:8.3f} ms")
    for k in (10, 100, 300):
        print(f"{k} chained small dispatches: {many_dispatches(k)*1e3:8.3f} ms")
