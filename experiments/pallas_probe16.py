"""Probe: while_loop per-iteration floor vs carry count.

The decode kernel runs ~1.0-1.26 us/step regardless of sweep sizes (V/R),
so something fixed dominates.  Hypotheses: (a) register spilling once the
carry count exceeds the vreg budget, (b) intrinsic while_loop iteration
overhead.  This probe times a minimal kernel whose body does one add per
carry, at varying carry counts, on real hardware.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_cache"))
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ = np.asarray(jax.jit(lambda x: x + 1)(jnp.ones((8, 128), jnp.int32)))

STEPS = 8192


def make(nc, sweep_rows=0):
    def kernel(x_ref, o_ref, buf):
        def body(c):
            step = c[0]
            rest = [v + jnp.int32(1) for v in c[1:]]
            if sweep_rows:
                rows = jax.lax.broadcasted_iota(
                    jnp.int32, (sweep_rows, 8, 128), 0)
                mask = rows == (rest[0] % sweep_rows)[None]
                s = jnp.sum(jnp.where(mask, buf[:], 0), axis=0)
                rest[0] = rest[0] + (s & 1)
            return (step + 1, *rest)

        def cond(c):
            return c[0] < STEPS

        init = (jnp.int32(0),) + tuple(
            x_ref[...] + i for i in range(nc))
        fin = jax.lax.while_loop(cond, body, init)
        o_ref[...] = fin[1]

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((max(sweep_rows, 1), 8, 128), jnp.int32)],
    )


x = jnp.ones((8, 128), jnp.int32)
for sweep in (0,):
    for nc in (4, 40, 64):
        f = jax.jit(make(nc, sweep))
        r = f(x)
        jax.block_until_ready(r)
        t0 = time.time()
        rs = [f(x) for _ in range(5)]
        jax.block_until_ready(rs)
        dt = (time.time() - t0) / 5
        print(f"carries {nc:3d} sweep {sweep:3d}: {dt*1e3:7.2f} ms "
              f"{dt/STEPS*1e9:8.1f} ns/step")
