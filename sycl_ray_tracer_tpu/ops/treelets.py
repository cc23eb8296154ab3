"""Treelet decomposition for scenes too large for one VMEM-resident BVH.

The packet kernels (traverse_pallas*.py) keep the whole node/leaf tile
tables in VMEM, which caps a single tree at ~1.1M triangles
(models/trace.py VMEM_TABLE_LIMIT_BYTES). Past that, round 1 fell back
to the XLA traversal at ~0.1-1 Mrays/s — a 100x cliff. This module
removes the cliff the TPU-native way:

- The scene is PARTITIONED SPATIALLY on the host (recursive largest-
  axis centroid median split) into chunks whose packed tile tables fit
  the VMEM budget.
- Each chunk gets its own independent SAH BVH via the native builder
  (ops/sah.py; Morton-heap fallback when the native lib is absent),
  packed with the same pack_tiles_np layout the kernels already read.
- Traversal runs one kernel pass per treelet over the SAME ray packets,
  CHAINED through the kernel's t_init input: pass i starts with pass
  i-1's best hit distances, so earlier hits cull later treelets'
  subtrees, and a per-lane root-AABB slab test deactivates lanes that
  cannot intersect the treelet at all (models/trace.py).
- All treelets share one static id threshold (`ni`) and padded table
  shape, so every pass reuses ONE compiled kernel.

Fills the role of Embree's out-of-core-scale rtcIntersect on
arbitrarily large scenes (the reference renders minecraft.glb this way,
/root/reference/benchmark.py:8); the treelet idea itself is the
standard BVH partitioning used by GPU out-of-core tracers.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import numpy as np

from sycl_ray_tracer_tpu.ops import sah as _sah
from sycl_ray_tracer_tpu.ops import wbvh as _wbvh

# ~44 bytes/tri of packed tiles measured at K=8 (round 1: 1.1M tris ~
# 48MB); default chunks of <=600K tris keep each treelet's tables near
# 26MB, leaving VMEM room for ray blocks + scratch.


def _max_tris() -> int:
    # read at call time, not import (env knobs must stay live — the
    # round-1 SRT_NO_SORT import-time read was flagged for this).
    # With v8 treelet drains (SRT_TL_V8=1) the default shrinks so each
    # treelet's ctiles + WOOP tiles (256 B/tri) stay under the v8
    # VMEM budget: ~330K tris -> ~85+3 MB per pass.
    if os.environ.get("SRT_TL_V8") == "1":
        return int(os.environ.get("SRT_TREELET_MAX_TRIS", 330_000))
    # Round-5: the 600K cap was conservative — minecraft at 2 treelets
    # (1.05M tris, ~102 MB staged tables/pass) compiles and runs 4.76
    # vs 4.19 Mrays/s at 4 treelets (tools/probe_tl_config.py). The
    # VMEM driver is the LEAF tiles (~64 B/tri), not nodes.
    return int(os.environ.get("SRT_TREELET_MAX_TRIS", 1_050_000))


class Treelets(NamedTuple):
    ctiles: np.ndarray   # [T, NT, 8, 128] float32
    ltiles: np.ndarray   # [T, LT, 8, 128] float32
    wtiles: np.ndarray   # [T, WT, 8, 128] float32 woop tiles
    #                      (SRT_TL_V8; [T, 1, 8, 128] dummy otherwise)
    remap: np.ndarray    # [T, S] int32: local hit slot -> canonical
    #                      morton slot (-1 pad)
    lo: np.ndarray       # [T, 3] treelet root bounds
    hi: np.ndarray       # [T, 3]
    ni: int              # shared leaf-id threshold for every treelet
    count: int


def partition(tri_v: np.ndarray, max_tris: int) -> list[np.ndarray]:
    """Recursive largest-axis centroid median split.

    Returns a list of index arrays (original triangle ids) each of
    length <= max_tris. Median split keeps the chunks balanced, so the
    shared padded table shape wastes little."""
    n = tri_v.shape[0]
    cent = tri_v.mean(axis=1)
    out = []

    def rec(ids):
        if ids.shape[0] <= max_tris:
            out.append(ids)
            return
        c = cent[ids]
        axis = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        order = np.argsort(c[:, axis], kind="stable")
        half = ids.shape[0] // 2
        rec(ids[order[:half]])
        rec(ids[order[half:]])

    rec(np.arange(n, dtype=np.int64))
    return out


def _build_chunk(chunk_v: np.ndarray, leaf_size: int):
    """One chunk -> (children [NI,48], child_ids [NI,8],
    leaves [L,9K], order [L*K] local ids, ni)."""
    sahb = _sah.build_sah(chunk_v, leaf_size)
    if sahb is not None:
        leaves = _sah.leaf_rows(chunk_v, sahb.order, leaf_size)
        return (sahb.children, sahb.child_ids, leaves, sahb.order,
                sahb.num_internal)
    bvh, _, _ = _wbvh.build_np(chunk_v, leaf_size)
    child_ids = _wbvh.heap_child_ids_np(bvh.num_internal)
    return (np.asarray(bvh.children), child_ids,
            np.asarray(bvh.leaves), np.asarray(bvh.order),
            bvh.num_internal)


def build_treelets(tri_v: np.ndarray, inv_morton: np.ndarray,
                   leaf_size: int = 8,
                   max_tris: int | None = None,
                   bf16_nodes: bool = False) -> Treelets:
    """Partition + per-chunk BVH build + shared-shape tile packing.

    inv_morton: original tri id -> canonical Morton slot (the global
    shading order built by models/scene.py), so every treelet's hits
    come out in the one id space all shading arrays use."""
    if leaf_size != 8:
        raise ValueError("treelets require leaf_size=8 (tile layout)")
    max_tris = max_tris or _max_tris()
    chunks = partition(tri_v, max_tris)
    built = []
    for ids in chunks:
        chunk_v = np.ascontiguousarray(tri_v[ids], np.float32)
        children, child_ids, leaves, order, ni = _build_chunk(
            chunk_v, leaf_size)
        built.append((ids, children, child_ids, leaves, order, ni))

    ni_shared = max(b[5] for b in built)
    packed = []
    for ids, children, child_ids, leaves, order, ni in built:
        # re-key leaf children to the SHARED threshold so every
        # treelet pass can use one compiled kernel (ni is static)
        adj = np.where(child_ids >= ni, child_ids - ni + ni_shared,
                       child_ids).astype(np.int32)
        ct, lt = _wbvh.pack_tiles_np(children, adj, leaves, leaf_size)
        wt = None
        if os.environ.get("SRT_TL_V8") == "1":
            from sycl_ray_tracer_tpu.ops import woop as _woop
            wt = _woop.pack_wtiles_affine_np(leaves, leaf_size)
        if bf16_nodes:
            # round-5 VERDICT #3: bf16-packed node tiles for treelet
            # scenes (conservative directed rounding — identical
            # results; 32 nodes/tile instead of 16). NOTE the VMEM
            # driver for treelets is the LEAF tiles (~64 B/tri vs the
            # nodes' ~9 B/tri), so this buys headroom, not a 2x
            # treelet-count cut.
            ct = _wbvh.pack_ctiles_bf16_np(children, adj)
        rm = np.where(order >= 0,
                      inv_morton[ids[np.maximum(order, 0)]],
                      -1).astype(np.int32)
        lo = tri_v[ids].reshape(-1, 3).min(axis=0)
        hi = tri_v[ids].reshape(-1, 3).max(axis=0)
        packed.append((ct, lt, wt, rm, lo, hi))

    t = len(packed)
    nt = max(p[0].shape[0] for p in packed)
    ltn = max(p[1].shape[0] for p in packed)
    use_w = packed[0][2] is not None
    wtn = max(p[2].shape[0] for p in packed) if use_w else 1
    s = max(p[3].shape[0] for p in packed)
    # every treelet's tables pad to the max shape (one compiled kernel
    # serves all passes); surface lopsided partitions instead of
    # silently blowing the per-treelet VMEM budget on padding
    used = sum(p[0].shape[0] + p[1].shape[0] for p in packed)
    alloc = t * (nt + ltn)
    if alloc > 0 and used / alloc < 0.75:
        import sys
        waste = 100.0 * (1.0 - used / alloc)
        print(f"[srt] treelet padding waste {waste:.0f}% ({t} treelets "
              f"pad to max tile shape {nt}+{ltn}); a lopsided "
              f"partition inflates every pass's VMEM tables",
              file=sys.stderr)
    ctiles = np.zeros((t, nt, 8, 128), np.float32)
    ltiles = np.zeros((t, ltn, 8, 128), np.float32)
    wtiles = np.zeros((t, wtn, 8, 128), np.float32)
    remap = np.full((t, s), -1, np.int32)
    lo = np.zeros((t, 3), np.float32)
    hi = np.zeros((t, 3), np.float32)
    for i, (ct, lt, wt, rm, l, h) in enumerate(packed):
        ctiles[i, :ct.shape[0]] = ct
        ltiles[i, :lt.shape[0]] = lt
        if wt is not None:
            wtiles[i, :wt.shape[0]] = wt
        remap[i, :rm.shape[0]] = rm
        lo[i] = l
        hi[i] = h
    return Treelets(ctiles=ctiles, ltiles=ltiles, wtiles=wtiles,
                    remap=remap, lo=lo, hi=hi, ni=ni_shared, count=t)
