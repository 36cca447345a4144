"""uk-2002-scale synthetic benchmark (BASELINE.md headline scale).

Generates a power-law web-like graph (utils/synth.py), encodes it with the
native multithreaded encoder (timed -> encode Medges/s + bits/link), then
times the Pallas kernel decode exactly like the cnr-2000 path in bench.py.
The synthetic CSR is the ground truth: the native decode of the encoded
stream is asserted equal to it (encode roundtrip), and the kernel decode is
asserted bit-exact against that oracle.

Scale knobs: BENCH_SYNTH_NODES nodes at mean outdegree 16 — 18.5M nodes
gives ~296M arcs, the uk-2002 regime (18.52M nodes / 298.1M arcs).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


class _SynthBV:
    """Duck-typed stand-in for BVGraph in bench.bench_graph."""

    def __init__(self, data, n, m, settings, offsets):
        self.data = data
        self.num_nodes = n
        self.num_arcs = m
        self.settings = settings
        self.offsets = offsets


def bench_synth(n_nodes, target_arcs, v_cap, r_cap):
    from bench import bench_graph, _log
    from webgraph_tpu import native
    from webgraph_tpu.codecs.bvgraph import BVGraphSettings
    from webgraph_tpu.utils.synth import synthesize_webgraph

    settings = BVGraphSettings()
    threads = os.cpu_count() or 1
    # the synthetic generator is seeded/deterministic, so the encoded stream
    # is cached across bench runs (generation alone is ~8 min at 18.5M
    # nodes); the encode is still timed on a cache miss, and the encode
    # roundtrip is asserted on the run that builds the cache
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         f".bench_synth_{n_nodes}.npz")
    gen_s = enc_s = -1.0
    if os.path.exists(cache):
        z = np.load(cache)
        data, offsets = z["data"], z["offsets"]
        n, m, gbits = int(z["n"]), int(z["m"]), int(z["gbits"])
        _log(f"synth cache hit: n={n} m={m}")
    else:
        t0 = time.time()
        co, su = synthesize_webgraph(n_nodes)
        n, m = n_nodes, int(co[-1])
        gen_s = time.time() - t0
        _log(f"synth: n={n} m={m} gen {gen_s:.1f}s")

        graph, gbits, offs_stream, _ob, _st = native.bv_encode(
            co, su, settings, threads=threads)
        offsets = native.decode_offset_stream(offs_stream, n,
                                              settings.offset_coding)
        data = graph

        # encode roundtrip: native decode must equal ground truth
        hco0, hsu0 = native.bv_decode_all(data, n, m, settings)
        assert np.array_equal(hco0, co) and np.array_equal(hsu0, su), \
            "synthetic encode roundtrip mismatch"
        del co, su, hco0, hsu0
        np.savez(cache, data=data, offsets=offsets, n=n, m=m, gbits=gbits)

    # COLD decode bench first: the plan/timing must never see an oracle
    # decode (the oracle runs inside bench_graph AFTER timing, for the
    # bit-exactness assert)
    bv = _SynthBV(data, n, m, settings, offsets)
    decode_s, extra = bench_graph(bv, data, target_arcs, v_cap, r_cap)
    assert extra["bit_exact"], "synthetic kernel decode not bit-exact"

    # host decode rate (reference point) + encode throughput; the
    # re-encode must reproduce the cached stream
    t0 = time.time()
    hco, hsu = native.bv_decode_all(data, n, m, settings)
    dec_host_s = time.time() - t0
    _log(f"host decode {dec_host_s:.1f}s")
    t0 = time.time()
    g2, gbits2, _o2, _ob2, _st2 = native.bv_encode(hco, hsu, settings,
                                                   threads=threads)
    enc_s = time.time() - t0
    assert gbits2 == gbits and np.array_equal(g2, data), \
        "synthetic re-encode diverged from cached stream"
    del g2, hco, hsu
    _log(f"encode {enc_s:.1f}s ({m / enc_s / 1e6:.1f} Medges/s)")
    extra["nodes"] = n
    extra["arcs"] = m
    extra["gen_s"] = round(gen_s, 1)
    extra["decode_Medges_per_s"] = round(m / decode_s / 1e6, 1)
    if enc_s > 0:
        extra["encode_Medges_per_s"] = round(m / enc_s / 1e6, 1)
    extra["encode_threads"] = threads
    extra["encode_bits_per_link"] = round(gbits / m, 3)
    extra["host_decode_Medges_per_s"] = round(m / dec_host_s / 1e6, 1)
    return extra


if __name__ == "__main__":
    import json
    nn = int(os.environ.get("BENCH_SYNTH_NODES", 18_500_000))
    ta = int(os.environ.get("BENCH_TARGET_ARCS", 128))
    vc = int(os.environ.get("BENCH_VCAP", 256))
    rc = int(os.environ.get("BENCH_RCAP", 96))
    print(json.dumps(bench_synth(nn, ta, vc, rc), default=str))
