#!/usr/bin/env python
"""Headline benchmark: BVGraph decode throughput on one chip.

Decodes the cnr-2000 golden fixture (325,557 nodes / 3,216,152 arcs,
BVGraph w=7 maxref=3 minint=3 zeta_3) with the vectorized two-phase decoder
and reports edges/second (device-resident output; median of timed reps,
after one warmup/compile run).  Output: ONE JSON line.

vs_baseline: ratio against the build target of 10x an estimated
single-thread Java reference decode rate (SpeedTest.java harness,
~200 M edges/s sequential successorBigArray scan on a modern core — the
repo publishes no number, see BASELINE.md), i.e. vs_baseline = 1.0 at
2.0 B edges/s.

Set BENCH_SYNTH_NODES to also run a uk-2002-scale synthetic power-law graph
(encoded by our own encoder first; slow on first use).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from webgraph_tpu.codecs.bvgraph import BVGraph
from webgraph_tpu.ops import vdecode as V1
from webgraph_tpu.ops import vdecode2 as V2

CNR = "/root/reference/slow/it/unimi/dsi/big/webgraph/cnr-2000"
JAVA_SINGLE_THREAD_EDGES_PER_S = 200e6  # documented estimate (BASELINE.md)
TARGET = 10 * JAVA_SINGLE_THREAD_EDGES_PER_S


def main():
    reps = int(os.environ.get("BENCH_REPS", 3))
    bv = BVGraph.load(CNR)
    cfg = V1.config_from_settings(
        bv.settings, batch=int(os.environ.get("BENCH_BATCH", 8192)))
    data = np.asarray(bv.data)
    m = bv.num_arcs

    # warmup + correctness spot-check
    co, succ = V2.decode_to_csr(data, bv.offsets, cfg, bvgraph=bv)
    assert co[-1] == m, "decode arc count mismatch"

    times = []
    for _ in range(reps):
        t0 = time.time()
        V2.decode_to_csr(data, bv.offsets, cfg, bvgraph=bv,
                         return_device=True)[1].block_until_ready()
        times.append(time.time() - t0)
    dt = sorted(times)[len(times) // 2]
    eps = m / dt
    print(json.dumps({
        "metric": "bvgraph_decode_cnr2000_edges_per_sec",
        "value": round(eps / 1e6, 2),
        "unit": "Medges/s",
        "vs_baseline": round(eps / TARGET, 4),
    }))


if __name__ == "__main__":
    main()
