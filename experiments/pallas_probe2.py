"""Probe 2: fori_loop per-step cost scaling, op costs, dynamic_gather on same-shape tiles."""
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
        print(f"OK   {name}: {dt*1e3:.3f} ms (chk {int(np.asarray(r).sum()) & 0xffffffff})")
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"FAIL {name}: {type(e).__name__}: {msg}")


def loop_kernel(steps, body_kind, shape=(8, 128)):
    def k(x_ref, o_ref):
        x = x_ref[:]

        def body(i, acc):
            if body_kind == "add":
                return acc + x
            if body_kind == "add10":
                for _ in range(10):
                    acc = acc + (x ^ acc)
                return acc
            if body_kind == "mul":
                return acc + x * acc
            if body_kind == "shift":
                return (acc + x) >> 1 | acc << 1
            if body_kind == "gather_tile":
                idx = (acc & 7).astype(jnp.int32)
                g = jnp.take_along_axis(x, idx, axis=0)
                return acc + g
            raise ValueError

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

    return lambda: timeit(f, x)


if __name__ == "__main__":
    for steps in (100, 1000, 10000):
        probe(f"add body, {steps} steps", loop_kernel(steps, "add"))
    probe("add10 body (10 ops), 1000 steps", loop_kernel(1000, "add10"))
    probe("mul body, 1000 steps", loop_kernel(1000, "mul"))
    probe("shift body, 1000 steps", loop_kernel(1000, "shift"))
    probe("same-shape tile gather (8,128), 1000 steps",
          loop_kernel(1000, "gather_tile"))
    probe("same-shape tile gather (16,128), 1000 steps",
          loop_kernel(1000, "gather_tile", (16, 128)))
    probe("add body, (64,128) tile, 1000 steps",
          loop_kernel(1000, "add", (64, 128)))
