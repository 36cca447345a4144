#!/usr/bin/env python
"""Headline benchmark: BVGraph decode throughput on one chip.

Decodes the cnr-2000 golden fixture (325,557 nodes / 3,216,152 arcs, BVGraph
w=7 maxref=3 minint=3 zeta_3) with the Pallas lane-per-chunk kernel
(webgraph_tpu.ops.kdecode) and reports edges/second.  Output: ONE JSON line.

The plan is COLD: built from .graph/.offsets/settings alone (native
header-only ref scan + on-device wavefront halo resolution + device-argsort
hub finalize) — the native oracle decoder runs only AFTER timing, for the
bit-exactness assert.  plan_s/resolve_s report the one-time cold cost.

Headline = the device kernel decode (all tiles incl. preset hub lanes, one
dispatch via scan).  After it every arc's value is device-resident — chunk
arcs in the store, hub residual segments in preset lanes, hub intervals
static, hub copies resolved by the composed source map — the analogue of
the reference's lazy successors() contract (BVGraph.java:995-1097).
BENCH_EXTRA additionally times decode_to_csr (the Pallas
ragged-compaction flatten to a dense device CSR) and one HyperBall round
consuming that CSR, so the decode product is demonstrably consumable.
Arcs outside the device envelope (rare error lanes) are host-decoded once
at warmup and spliced from a cached device buffer; their fraction is
reported as fallback_arc_frac (~0 with the device hub path on).

Measurement protocol (docs/TPU_RUNTIME_NOTES.md): the tunnel runtime's
initial async dispatch mode is pathological and unmeasurable; a readback at
process start switches to the sync dispatch mode where block_until_ready is
truthful; timings are medians of 3 windows of `depth` decodes (dispatches
pipelined so the ~22 ms tunnel RTT is paid once per window).

vs_baseline: ratio against the build target of 10x an estimated
single-thread Java reference decode rate (~200 M edges/s, BASELINE.md),
i.e. vs_baseline = 1.0 at 2.0 B edges/s.

Env knobs: BENCH_TARGET_ARCS/BENCH_VCAP/BENCH_RCAP (default 128/512/160),
BENCH_HUB_DEVICE=0 to host-fill hub nodes instead of the device hub path,
BENCH_SYNTH_NODES to size the uk-2002-scale synthetic (0 disables),
WG_CSR_ENGINE=gather to bypass the compaction kernel.
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

import jax.numpy as jnp
import numpy as np

from webgraph_tpu import native
from webgraph_tpu.codecs.bvgraph import BVGraph
from webgraph_tpu.ops import kdecode as K

CNR = "/root/reference/slow/it/unimi/dsi/big/webgraph/cnr-2000"
JAVA_SINGLE_THREAD_EDGES_PER_S = 200e6  # documented estimate (BASELINE.md)
TARGET = 10 * JAVA_SINGLE_THREAD_EDGES_PER_S


def _log(*a):
    if os.environ.get("BENCH_VERBOSE"):
        print(*a, file=sys.stderr, flush=True)


def bench_graph(bv, data, target_arcs, v_cap, r_cap, oracle=None,
                hub_device=None):
    """Cold-plan + timed decode.  Returns (decode_s, csr_s, extras)."""
    if hub_device is None:
        hub_device = bool(int(os.environ.get("BENCH_HUB_DEVICE", 1)))
    m = bv.num_arcs

    # ---- cold plan: .graph/.offsets/settings only ----
    t0 = time.time()
    outd = native.decode_outdegrees(data, bv.offsets,
                                    bv.settings.outdegree_coding)
    prep = K.plan_kernel_decode(bv.offsets, outd, bv.settings, data,
                                target_arcs_per_lane=target_arcs,
                                v_cap=v_cap, r_cap=r_cap,
                                hub_device=hub_device)
    plan_s = time.time() - t0
    if prep is None:
        raise RuntimeError("config outside kernel envelope")
    assert prep.cold, "plan must not see any oracle decode"
    t0 = time.time()
    passes = K.resolve_halos(prep)
    jax.block_until_ready(prep.init_out)
    resolve_s = time.time() - t0
    _log(f"plan {plan_s:.2f}s resolve {resolve_s:.2f}s ({passes} passes)")

    # ---- warmup: compile + fill-cache build (one host fill, cached) ----
    t0 = time.time()
    K.plan_csr_index(prep)
    co, succ, fill = K.decode_to_csr(prep, data=data, settings=bv.settings)
    succ.block_until_ready()
    warm_s = time.time() - t0
    succ = None   # ~4 bytes/arc of HBM; re-produced after timing
    errs = K.check_diag(prep, np.asarray(K.decode_chunked(prep)[1]))
    nc = prep.n_chunk_lanes
    bad = prep.skipped | (errs[:nc] != 0)
    fb = K.hub_fallback_nodes(prep, errs)
    cum = prep.cum_arcs
    bad_arcs = int((cum[prep.chunk_starts[1:]]
                    - cum[prep.chunk_starts[:-1]])[bad].sum())
    if len(fb):
        bad_arcs += int(np.diff(cum)[fb].sum())
    _log(f"warm {warm_s:.1f}s bad lanes {int(bad.sum())} "
         f"hub fallback {len(fb)} fallback arcs {bad_arcs}")

    # ---- timed windows, pipelined ----
    # headline: the kernel decode (one dispatch, all tiles + preset hub
    # lanes).  After it, every arc's value is device-resident: chunk arcs
    # in the store, hub residual segments in preset lanes, hub intervals
    # static, hub copies resolved by the composed source map — the same
    # contract as the reference's lazy successors() access path
    # (BVGraph.java:995-1097).  decode_to_csr (timed separately) then
    # materializes the dense CSR with the compaction kernel.
    store_bytes = prep.spec.T * prep.spec.V * 1024 * 4
    depth = max(1, min(5, int(5e9 // max(store_bytes, 1))))
    _log("pipeline depth", depth)

    times = []
    for _ in range(3):
        t0 = time.time()
        res = [K.decode_chunked(prep) for _ in range(depth)]
        jax.block_until_ready(res)
        times.append((time.time() - t0) / depth)
        res = None
    decode_s = sorted(times)[1]
    _log("timed decode", decode_s)

    csr_times = []
    for _ in range(3):
        t0 = time.time()
        _, s, _ = K.decode_to_csr(prep)
        s.block_until_ready()
        csr_times.append(time.time() - t0)
        s = None
    csr_s = sorted(csr_times)[1]
    _log("timed decode_to_csr", csr_s)

    # one HyperBall round consuming the device CSR (decode -> analytics
    # with no host roundtrip; HyperBall.java:654-900)
    hb_s = None
    try:
        import jax.numpy as jnp

        from webgraph_tpu.algo import hyperball as HB

        co_t, succ_t, _ = K.decode_to_csr(prep)
        regs = HB.pack_registers(
            jnp.asarray(HB.hyperloglog_init(bv.num_nodes, 4)))
        hb_plan = HB.DenseRoundPlan(np.asarray(co_t), succ_t)
        r = HB.device_round(np.asarray(co_t), succ_t, regs, plan=hb_plan)
        r.block_until_ready()
        t0 = time.time()
        r = HB.device_round(np.asarray(co_t), succ_t, regs, plan=hb_plan)
        r.block_until_ready()
        hb_s = time.time() - t0
        del r, regs, succ_t, hb_plan
    except Exception as e:  # noqa: BLE001
        _log("hyperball round failed:", repr(e))

    # ---- correctness: device CSR must match the oracle (decoded NOW,
    # after timing — the plan never saw it) ----
    if oracle is None:
        hco, hsu = native.bv_decode_all(data, bv.num_nodes, m, bv.settings)
    else:
        hco, hsu = oracle[0], oracle[1]
    _, succ, _ = K.decode_to_csr(prep)
    ok = (np.array_equal(np.asarray(succ, dtype=np.int64), hsu)
          and np.array_equal(np.asarray(co), hco))

    extras = dict(plan_s=round(plan_s, 3), resolve_s=round(resolve_s, 3),
                  resolve_passes=passes, warm_s=round(warm_s, 2),
                  bit_exact=bool(ok),
                  csr_s=round(csr_s, 3),
                  decode_to_csr_Medges_per_s=round(m / csr_s / 1e6, 1),
                  hyperball_round_s=(round(hb_s, 3) if hb_s else None),
                  fallback_arc_frac=round(bad_arcs / max(m, 1), 5),
                  spec=dict(T=prep.spec.T, V=prep.spec.V, R=prep.spec.R))
    return decode_s, extras


def bench_ef(bv, hco, hsu):
    """EFGraph on-device decode rate at fixture scale (VERDICT r3 #6)."""
    import tempfile

    from webgraph_tpu.codecs.efgraph import EFGraph
    from webgraph_tpu.ops import efdecode

    with tempfile.TemporaryDirectory() as td:
        base = os.path.join(td, "ef")
        from webgraph_tpu.core.graph import CSRGraph
        g = CSRGraph(hco, hsu)
        t0 = time.time()
        EFGraph.store(g, base)
        enc_s = time.time() - t0
        ef = EFGraph.load(base)

        # plan once (stream upload + compile); then each decode is ONE
        # device dispatch producing a device CSR — the consumable product,
        # timed device-resident like the BVGraph kernel
        t0 = time.time()
        plan = efdecode.EFDevicePlan(ef.words, ef.offsets, ef.upper_bound,
                                     ef.log2_quantum)
        _, succ = plan.decode()
        succ.block_until_ready()
        warm = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.time()
            _, succ = plan.decode()
            succ.block_until_ready()
            times.append(time.time() - t0)
        dec_s = sorted(times)[1]
        ok = np.array_equal(np.asarray(succ, dtype=np.int64), hsu)
        return dict(encode_s=round(enc_s, 2), warm_s=round(warm, 2),
                    decode_Medges_per_s=round(len(hsu) / dec_s / 1e6, 1),
                    bit_exact=bool(ok))


def bench_tpu_encode(hco, hsu, settings, golden_bytes=None):
    """Vectorized TPU encoder timing (VERDICT r3 #4): CSR -> BVGraph
    stream on device, byte-identical to the native stream.  The CSR
    uploads once (EncodeDevicePlan); each timed encode is the on-device
    pipeline (masks -> cost matrix -> greedy-selection scan -> pack) plus
    the compressed-stream download."""
    from webgraph_tpu.ops import vencode

    m = int(hco[-1])
    t0 = time.time()
    plan = vencode.EncodeDevicePlan(hco, hsu, settings)
    gbytes, gbits, _starts, _refs, _rcs, _stats = plan.encode()
    warm = time.time() - t0
    times = []
    for _ in range(2):
        t0 = time.time()
        gbytes, gbits, _starts, _refs, _rcs, _stats = plan.encode()
        times.append(time.time() - t0)
    enc_s = min(times)
    r = dict(warm_s=round(warm, 1),
             encode_Medges_per_s=round(m / enc_s / 1e6, 1),
             bits_per_link=round(gbits / max(m, 1), 3))
    if golden_bytes is not None:
        r["byte_identical"] = bool(
            np.array_equal(np.frombuffer(gbytes, dtype=np.uint8),
                           np.asarray(golden_bytes, dtype=np.uint8)))
    return r


def main():
    target_arcs = int(os.environ.get("BENCH_TARGET_ARCS", 128))
    v_cap = int(os.environ.get("BENCH_VCAP", 512))
    r_cap = int(os.environ.get("BENCH_RCAP", 160))

    # switch the tunnel runtime into its (truthful, fast) sync dispatch mode
    _ = np.asarray(jax.jit(lambda x: x + 1)(jnp.ones((8, 128), jnp.int32)))

    bv = BVGraph.load(CNR)
    data = np.asarray(bv.data)
    m = bv.num_arcs
    decode_s, extra = bench_graph(bv, data, target_arcs, v_cap, r_cap)
    eps = m / decode_s
    assert extra["bit_exact"], "decode is not bit-exact vs the native oracle"
    extra["decode_Medges_per_s"] = round(eps / 1e6, 1)

    # encode throughput: native host path + TPU vectorized path
    hco, hsu = native.bv_decode_all(data, bv.num_nodes, m, bv.settings)
    t0 = time.time()
    _g, gbits, _o, _ob, _st = native.bv_encode(hco, hsu, bv.settings,
                                               threads=os.cpu_count() or 1)
    enc_s = time.time() - t0
    extra["encode_Medges_per_s"] = round(m / enc_s / 1e6, 1)
    extra["encode_bits_per_link"] = round(gbits / m, 3)

    results = {"cnr2000": extra}
    try:
        results["cnr2000_tpu_encode"] = bench_tpu_encode(
            hco, hsu, bv.settings, golden_bytes=data)
    except Exception as e:  # noqa: BLE001
        results["cnr2000_tpu_encode"] = {"error": repr(e)}
    try:
        results["cnr2000_ef"] = bench_ef(bv, hco, hsu)
    except Exception as e:  # noqa: BLE001
        results["cnr2000_ef"] = {"error": repr(e)}

    # uk-2002-scale synthetic (~18.5M nodes / ~355M arcs) runs by default;
    # BENCH_SYNTH_NODES=0 disables.  Failures there must not lose the
    # headline line.
    synth_nodes = int(os.environ.get("BENCH_SYNTH_NODES", 18_500_000))
    if synth_nodes:
        from bench_synth import bench_synth
        try:
            results["synthetic"] = bench_synth(synth_nodes, target_arcs,
                                               v_cap, r_cap)
        except Exception as e:  # noqa: BLE001
            results["synthetic"] = {"error": repr(e)}

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_EXTRA.json"), "w") as f:
        json.dump(results, f, indent=1, default=str)

    # headline: BASELINE.md's build target is uk-2002 scale, so report the
    # synthetic's decode rate when it ran; cnr-2000 otherwise (both always
    # land in BENCH_EXTRA.json)
    synth = results.get("synthetic", {})
    if synth.get("bit_exact"):
        s_eps = synth["decode_Medges_per_s"] * 1e6
        print(json.dumps({
            "metric": "bvgraph_cold_decode_uk2002scale_edges_per_sec",
            "value": round(s_eps / 1e6, 2),
            "unit": "Medges/s",
            "vs_baseline": round(s_eps / TARGET, 4),
        }))
    else:
        print(json.dumps({
            "metric": "bvgraph_cold_decode_cnr2000_edges_per_sec",
            "value": round(eps / 1e6, 2),
            "unit": "Medges/s",
            "vs_baseline": round(eps / TARGET, 4),
        }))


if __name__ == "__main__":
    main()
