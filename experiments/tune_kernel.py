"""Kernel operating-point sweep on the real chip (uses the bench synth cache).

Usage: python experiments/tune_kernel.py "ta=128,vc=256,rc=96,bm=32,im=32" ...
Each spec string is one configuration; prints one JSON line per config.
"""

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from webgraph_tpu import native
from webgraph_tpu.codecs.bvgraph import BVGraphSettings
from webgraph_tpu.ops import kdecode as K

CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".bench_synth_18500000.npz")


def run(cfg, data, offsets, n, m, settings, oracle):
    hco, hsu, refs = oracle
    outd = np.diff(hco)
    t0 = time.time()
    prep = K.plan_kernel_decode(
        offsets, outd, settings, data, halo_csr=(hco, hsu), refs=refs,
        target_arcs_per_lane=cfg.get("ta", 128), v_cap=cfg.get("vc", 256),
        r_cap=cfg.get("rc", 96), bmax=cfg.get("bm", 32),
        imax=cfg.get("im", 32), unroll=cfg.get("un"),
        burst=cfg.get("bu", 4), res_burst=cfg.get("rb", 4),
        quad_mask=cfg.get("qm"))
    plan_s = time.time() - t0
    if prep is None:
        return dict(cfg=cfg, error="no plan")
    o, dg, hv = K.decode_full(prep)
    jax.block_until_ready((o, dg) if hv is None else (o, dg, hv))
    dgn = np.asarray(dg).reshape(prep.spec.T, K.DIAG_ROWS, 1024)
    steps = dgn[:, K.DIAG_STEPS, 0]          # per-tile iteration count
    errs = K.check_diag(prep, np.asarray(dg))
    nc = prep.n_chunk_lanes
    bad = prep.skipped | (errs[:nc] != 0)
    fb = K.hub_fallback_nodes(prep, errs)
    bad_arcs = int((prep.cum_arcs[prep.chunk_starts[1:]]
                    - prep.cum_arcs[prep.chunk_starts[:-1]])[bad].sum())
    bad_arcs += int(np.diff(prep.cum_arcs)[fb].sum()) if len(fb) else 0
    hub_arcs = (int(prep.hub.hb_off[-1]) if prep.hub is not None else 0)
    succ_fill = np.empty(m, dtype=np.int64)

    def host_fill():
        t = time.time()
        if bad.any() or len(fb):
            K.fill_lanes(prep, bad, succ_fill, data, settings,
                         hub_nodes=fb)
        return time.time() - t

    out_bytes = prep.spec.T * prep.spec.V * 1024 * 4
    depth = max(1, min(5, int(8e9 // max(out_bytes, 1))))
    del o, dg, hv
    pool = ThreadPoolExecutor(2)
    times, fill_s, dev_s = [], 0.0, []
    for _ in range(3):
        t0 = time.time()
        futs = [pool.submit(host_fill) for _ in range(depth)]
        res = [K.decode_full(prep) for _ in range(depth)]
        jax.block_until_ready(res)
        t_dev = time.time() - t0
        fill_s = max(f.result() for f in futs)
        times.append((time.time() - t0) / depth)
        dev_s.append(t_dev / depth)
        res = None
    decode_s = sorted(times)[1]
    tot_steps = int(steps.sum())
    return dict(cfg=cfg, plan_s=round(plan_s, 1),
                T=prep.spec.T, V=prep.spec.V, R=prep.spec.R,
                BM=prep.spec.BMAX, IM=prep.spec.IMAX,
                QM=prep.spec.quad_mask,
                steps=tot_steps,
                ns_step=round(sorted(dev_s)[1] / max(tot_steps, 1) * 1e9, 1),
                depth=depth,
                fill_s=round(fill_s, 3),
                dev_s=round(sorted(dev_s)[1], 4),
                decode_s=round(decode_s, 4),
                fallback_frac=round(bad_arcs / m, 4),
                hub_frac=round(hub_arcs / m, 4),
                Medges_s=round(m / decode_s / 1e6, 1))


def main():
    import jax.numpy as jnp
    _ = np.asarray(jax.jit(lambda x: x + 1)(jnp.ones((8, 128), jnp.int32)))
    z = np.load(CACHE)
    data, offsets = z["data"], z["offsets"]
    n, m = int(z["n"]), int(z["m"])
    settings = BVGraphSettings()
    t0 = time.time()
    oracle = native.bv_decode_all_refs(data, n, m, settings)
    print(f"# oracle {time.time()-t0:.0f}s", file=sys.stderr, flush=True)
    for spec in sys.argv[1:]:
        cfg = {}
        for kv in spec.split(","):
            k, v = kv.split("=")
            cfg[k] = int(v)
        r = run(cfg, data, offsets, n, m, settings, oracle)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
