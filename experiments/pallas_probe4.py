"""Probe 4: honest timing via host readback (block_until_ready lies here)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(f, *a, reps=5):
    """Time dispatch -> full completion, forced by reading one element back."""
    np.asarray(f(*a))  # warmup incl. compile + full fetch
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = f(*a)
        # force completion: fetch a scalar that depends on the result
        float(jnp.sum(r[..., :1, :1]) if r.ndim >= 2 else jnp.sum(r))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def noop_roundtrip():
    a = jnp.ones((8, 128), jnp.int32)
    f = jax.jit(lambda x: x + 1)
    return timeit(f, a)


def loop_kernel(steps, shape=(8, 128), body_ops=1):
    def k(x_ref, o_ref):
        x = x_ref[:]

        def body(i, acc):
            for _ in range(body_ops):
                acc = acc + (x ^ acc)
            return acc

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
    a = jnp.asarray(np.random.randn(size, size) * 0.01, dtype=jnp.bfloat16)

    @jax.jit
    def f(a):
        x = a
        for _ in range(chain):
            x = jnp.dot(x, a, preferred_element_type=jnp.bfloat16)
        return x

    return timeit(f, a)


def sort_3m():
    m = 3_216_152
    k1 = jnp.asarray(np.random.randint(0, 325557, m), dtype=jnp.int32)
    k2 = jnp.asarray(np.random.randint(0, 325557, m), dtype=jnp.int32)
    v = jnp.asarray(np.random.randint(0, 1 << 30, m), dtype=jnp.int32)
    f = jax.jit(lambda a, b, c: jax.lax.sort((a, b, c), num_keys=2)[2])
    return timeit(f, k1, k2, v)


def gather_3m():
    m = 3_216_152
    t = jnp.asarray(np.random.randint(0, 1 << 30, m), dtype=jnp.int32)
    idx = jnp.asarray(np.random.randint(0, m, m), dtype=jnp.int32)
    f = jax.jit(lambda t, i: jax.lax.optimization_barrier(jnp.take(t, i)))
    return timeit(f, t, idx)


if __name__ == "__main__":
    print(f"noop roundtrip: {noop_roundtrip()*1e3:8.3f} ms")
    for steps in (100, 1000, 10000, 100000):
        print(f"pallas loop {steps:>7} steps x1op: {loop_kernel(steps)*1e3:8.3f} ms")
    for ops in (10, 50):
        print(f"pallas loop 10000 steps x{ops}ops: {loop_kernel(10000, body_ops=ops)*1e3:8.3f} ms")
    print(f"pallas loop 10000 steps (32,128): {loop_kernel(10000, shape=(32, 128))*1e3:8.3f} ms")
    for size, chain in ((2048, 4), (4096, 8)):
        fl = 2 * chain * size**3
        dt = matmul_chain(size, chain)
        print(f"xla matmul {size} x{chain}: {dt*1e3:8.3f} ms ({fl/dt/1e12:.1f} Tflop/s)")
    print(f"xla 2-key sort of 3.2M:  {sort_3m()*1e3:8.3f} ms")
    print(f"xla gather of 3.2M:      {gather_3m()*1e3:8.3f} ms")
