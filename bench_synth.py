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

    t0 = time.time()
    co, su = synthesize_webgraph(n_nodes)
    n, m = n_nodes, int(co[-1])
    gen_s = time.time() - t0
    _log(f"synth: n={n} m={m} gen {gen_s:.1f}s")

    settings = BVGraphSettings()
    threads = os.cpu_count() or 1
    t0 = time.time()
    graph, gbits, offs_stream, _ob, _st = native.bv_encode(
        co, su, settings, threads=threads)
    enc_s = time.time() - t0
    _log(f"encode {enc_s:.1f}s ({m / enc_s / 1e6:.1f} Medges/s)")

    offsets = native.decode_offset_stream(offs_stream, n,
                                          settings.offset_coding)
    data = graph

    # oracle: native decode of the encoded stream; must equal ground truth
    t0 = time.time()
    hco, hsu, refs = native.bv_decode_all_refs(data, n, m, settings)
    dec_host_s = time.time() - t0
    assert np.array_equal(hco, co) and np.array_equal(hsu, su), \
        "synthetic encode roundtrip mismatch"
    del su
    _log(f"host oracle decode {dec_host_s:.1f}s")

    bv = _SynthBV(data, n, m, settings, offsets)
    decode_s, extra = bench_graph(bv, data, target_arcs, v_cap, r_cap,
                                  oracle=(hco, hsu, refs))
    assert extra["bit_exact"], "synthetic kernel decode not bit-exact"
    extra["nodes"] = n
    extra["arcs"] = m
    extra["gen_s"] = round(gen_s, 1)
    extra["decode_Medges_per_s"] = round(m / decode_s / 1e6, 1)
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
