"""Host orchestration for the v2 vectorized BVGraph decoder.

Combines: pass 0 (outdegrees) + pass 0.5 (references/block counts) from
vectorized code reads, the virtual-lane parse loop (vparse2.parse_v2), and
the phase-2 reference resolution of vdecode.  See vparse2.py for the engine
design and vdecode.py for the architecture and reference citations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import vdecode as V1
from .packed import pack_words_u32
from .vparse2 import pass05, run_parse

__all__ = ["decode_to_csr"]


def decode_to_csr(data, offsets, cfg: V1.ParseConfig, bvgraph=None,
                  return_device=False):
    """Full v2 vectorized decode: byte stream + bit offsets -> (csr_off, succ)."""
    offsets = np.asarray(offsets, dtype=np.int64)
    n = len(offsets) - 1
    if offsets[-1] >= 2**31:
        # big stream: delegate to the sliced kernel driver (int32-safe
        # per-slice rebasing, ops/bigdecode.py)
        from .vdecode import _big_fallback
        return _big_fallback(data, offsets, cfg, bvgraph)
    words = jnp.asarray(pack_words_u32(data))
    MB = cfg.max_blocks

    starts = jnp.asarray(offsets[:-1], dtype=jnp.int32)
    outd, pos_a, _uo = V1._pass0(words, starts, cfg)
    refs, bc, pos_c = pass05(words, pos_a, outd, cfg)

    outd_np = np.asarray(outd)
    refs_np = np.asarray(refs)
    bc_np = np.asarray(bc)
    pos_c_np = np.asarray(pos_c)

    csr_off_np = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(outd_np, out=csr_off_np[1:])
    m = int(csr_off_np[-1])
    assert m < 2**31, "chunk with >= 2^31 arcs: split into chunks"
    csr32 = csr_off_np[:n].astype(np.int32)

    # node queue: drop nodes with no parse work (d == 0, or a full-copy entry
    # with no extra part); order by entry bit size, largest first
    ref_outd_np = np.where(refs_np > 0, outd_np[np.maximum(
        np.arange(n, dtype=np.int64) - refs_np, 0)], 0).astype(np.int32)
    copied0 = np.where((refs_np > 0) & (bc_np == 0), ref_outd_np, 0)
    extra0 = outd_np - copied0
    work = (outd_np > 0) & ((bc_np > 0) | (extra0 > 0))
    queue = np.flatnonzero(work)
    sizes = (offsets[1:] - offsets[:-1])[queue]
    queue = queue[np.argsort(-sizes, kind="stable")].astype(np.int32)
    n_q = len(queue)
    B = cfg.batch
    padded = max(B, -(-max(n_q, 1) // B) * B)

    meta = np.zeros((padded, 8), dtype=np.int32)
    meta[:n_q, 0] = queue
    meta[:n_q, 1] = pos_c_np[queue]
    meta[:n_q, 2] = outd_np[queue]
    meta[:n_q, 3] = bc_np[queue]
    meta[:n_q, 4] = queue  # value-base id == blocks-row id on one chip
    meta[:n_q, 5] = ref_outd_np[queue]
    meta[:n_q, 6] = csr32[queue]
    meta[:n_q, 7] = copied0[queue]

    blocks_off = m + 1
    big = jnp.zeros(m + 1 + (n + 1) * MB, dtype=jnp.int32)
    big = run_parse(words, jnp.asarray(meta), big, n_q, blocks_off, cfg)
    out = big[:m + 1]
    blocks = big[m + 1:].reshape(n + 1, MB)

    # per-node copied counts, recomputed vectorized from the block lists
    refs_dev = jnp.concatenate([refs, jnp.zeros(1, jnp.int32)])
    bc_dev = jnp.concatenate([bc, jnp.zeros(1, jnp.int32)])
    outd_dev = jnp.concatenate([outd, jnp.zeros(1, jnp.int32)])
    copied_arr = _copied_from_blocks(blocks, bc_dev, refs_dev, outd_dev, MB)

    # overflow nodes (bc > MB): patch rows from the scalar oracle
    flagged = np.flatnonzero(bc_np > MB)
    if len(flagged):
        if bvgraph is None:
            raise OverflowError(
                f"{len(flagged)} nodes exceed max_blocks={cfg.max_blocks}")
        out_np = np.asarray(out).copy()
        for x in flagged:
            row = bvgraph.successors(int(x))
            out_np[csr_off_np[x]:csr_off_np[x] + len(row)] = row
        out = jnp.asarray(out_np)
        r2 = np.asarray(refs_dev).copy()
        r2[flagged] = 0
        refs_dev = jnp.asarray(r2)
        c2 = np.asarray(copied_arr).copy()
        c2[flagged] = 0
        copied_arr = jnp.asarray(c2)

    # phase 2: reference resolution (vdecode engine)
    depth = V1._depths(refs_dev[:n]) if n else jnp.zeros(0, jnp.int32)
    depth = jnp.concatenate([depth, jnp.zeros(1, jnp.int32)])
    dmax = int(jnp.max(depth)) if n else 0
    max_bc = int(jnp.max(bc_dev)) if n else 0
    K = max(min(cfg.max_blocks // 2 + 1, max_bc // 2 + 2), 1)
    ref_len = jnp.take(
        outd_dev,
        jnp.maximum(jnp.arange(n + 1, dtype=jnp.int32) - refs_dev, 0),
        mode="clip")
    kstart, klen, kcum = V1._kept_ranges(blocks, bc_dev, ref_len, K)
    csr_dev = jnp.asarray(csr_off_np)
    row_of_slot = jnp.asarray(np.repeat(
        np.arange(n, dtype=np.int32), np.diff(csr_off_np)))
    for t in range(0, dmax + 1):
        out = V1._resolve_depth(out, jnp.int32(t), csr_dev, row_of_slot,
                                refs_dev, copied_arr, kstart, klen, kcum,
                                depth, K)
    if return_device:
        return csr_off_np, out[:m]
    succ = np.asarray(out[:m], dtype=np.int64)
    return csr_off_np, succ


@jax.jit
def _copied_from_blocks(blocks, bc, refs, outd, MB=None):
    MB = blocks.shape[1]
    n1 = blocks.shape[0]
    cols = jnp.arange(MB, dtype=jnp.int32)[None, :]
    valid = cols < bc[:, None]
    even = (cols % 2) == 0
    s_even = jnp.sum(jnp.where(valid & even, blocks, 0), axis=1)
    total = jnp.sum(jnp.where(valid, blocks, 0), axis=1)
    idx = jnp.arange(n1, dtype=jnp.int32)
    ref_len = jnp.take(outd, jnp.maximum(idx - refs, 0), mode="clip")
    tail = jnp.where(bc % 2 == 0, ref_len - total, 0)
    copied = jnp.where(refs > 0,
                       jnp.where(bc == 0, ref_len, s_even + tail), 0)
    return copied.astype(jnp.int32)
