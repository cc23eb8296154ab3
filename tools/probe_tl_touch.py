#!/usr/bin/env python
"""How many treelets does a sorted packet actually TOUCH? (round-4
VERDICT #5 evidence, no TPU time needed)

The treelet path chains one kernel pass per treelet (t_init chaining,
models/trace.py): every pass dispatches the full packet grid, so a
packet pays ~2 visits per treelet it does NOT need (root slab rejects)
plus a full walk per treelet it does. The VERDICT's streaming
candidate would instead DMA treelet tiles HBM->VMEM per packet inside
ONE kernel — its cost is bytes(treelets touched) per packet. Both
designs are priced by the same statistic, measured here with the
tree_quality numpy union walker on the production treelet partition:

  per sorted 1024-ray packet: how many treelet root bboxes the packet
  enters (pruned by each ray's final closest hit), for primaries and
  for first-bounce diffuse queues.

DMA arithmetic printed at the end: touched/packet x bytes/treelet vs
v5e HBM (~819 GB/s) gives the streaming design's floor per 1M-ray
intersect, to compare against the measured chained-pass cost.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("SRT_PLATFORM", "cpu")

import numpy as np

from sycl_ray_tracer_tpu.ops import sah, treelets as tlmod
from sycl_ray_tracer_tpu.utils.gltf import load_glb
from sycl_ray_tracer_tpu.utils import procgen

from tree_quality import P, Tree, walk_packet, sort_key, morton3


def slab_any(o, d, t, lo, hi):
    """Does any ray's [tnear, t] segment enter the box?"""
    invd = np.where(np.abs(d) > 1e-12, 1.0 / d, np.float32(1e12))
    t1 = (lo[None] - o) * invd
    t2 = (hi[None] - o) * invd
    tmin = np.minimum(t1, t2).max(1)
    tmax = np.maximum(t1, t2).min(1)
    return bool(np.any((tmax >= np.maximum(tmin, 1e-4))
                       & (tmin < t))), int(
        np.sum((tmax >= np.maximum(tmin, 1e-4)) & (tmin < t)))


def main():
    n_pk = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    host = load_glb(procgen.minecraft_like_glb())
    tri = host.tri_v
    ids_parts = tlmod.partition(tri, tlmod._max_tris())
    T = len(ids_parts)
    print(f"minecraft_proc: {tri.shape[0]} tris, {T} treelets "
          f"(production partition, max {tlmod._max_tris()})")
    los, his, trees, sizes = [], [], [], []
    for ids in ids_parts:
        sub = tri[ids]
        los.append(sub.reshape(-1, 3).min(0))
        his.append(sub.reshape(-1, 3).max(0))
        b = sah.build_sah(sub, 8)
        trees.append((Tree(sub, b), ids))
        sizes.append(ids.shape[0])
    bytes_per = [s * 44 for s in sizes]   # ~44 packed B/tri (scene.py)
    print("treelet tris:", sizes,
          " bytes:", [f"{b/1e6:.0f}M" for b in bytes_per])

    lo = tri.reshape(-1, 3).min(0)
    hi = tri.reshape(-1, 3).max(0)
    rs = np.random.RandomState(7)
    res = 1024
    n = n_pk * P
    cp = np.asarray(host.camera_position, np.float32)
    cd = np.asarray(host.camera_direction, np.float32)
    cd = cd / np.linalg.norm(cd)
    up = np.array([0, 1, 0], np.float32)
    right = np.cross(cd, up)
    right /= np.linalg.norm(right)
    vup = np.cross(right, cd)
    fl = float(host.camera_focal_length or 1.0)
    pix = rs.randint(0, res, (n, 2))
    px = (pix[:, 0] + 0.5) / res - 0.5
    py = (pix[:, 1] + 0.5) / res - 0.5
    d = (cd[None] * fl + right[None] * px[:, None]
         + vup[None] * py[:, None]).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = np.broadcast_to(cp, (n, 3)).astype(np.float32).copy()
    q = np.clip(pix * (1024 // res), 0, 1023).astype(np.uint64)
    key = morton3(q[:, 0], q[:, 1], np.zeros(n, np.uint64))
    srt = np.argsort(key, kind="stable")
    o, d = o[srt], d[srt]

    def closest(o_, d_):
        """Chained closest hit + per-ray treelet-entered counts."""
        m = o_.shape[0]
        t = np.full(m, np.inf, np.float32)
        hid = np.full(m, -1, np.int64)
        for (tr, ids), l, h in zip(trees, los, his):
            _, _, tt, hh = walk_packet(tr, o_, d_)
            better = tt < t
            t = np.where(better, tt, t)
            hid = np.where(better & (hh >= 0), ids[np.maximum(hh, 0)],
                           hid)
        return t, hid

    def stats(o_, d_, label):
        m = o_.shape[0] // P * P
        t_fin = np.empty(m, np.float32)
        touched_pk = []
        touched_ray = 0
        for pk in range(m // P):
            s = slice(pk * P, (pk + 1) * P)
            t, _ = closest(o_[s], d_[s])
            t_fin[s] = t
            cnt = 0
            for l, h in zip(los, his):
                any_, nray = slab_any(o_[s], d_[s], t, l, h)
                cnt += int(any_)
                touched_ray += nray
            touched_pk.append(cnt)
        tp = np.asarray(touched_pk)
        print(f"{label}: packets {len(tp)}, treelets entered/packet "
              f"mean {tp.mean():.2f} (min {tp.min()} max {tp.max()}), "
              f"per-RAY mean {touched_ray/m:.2f}")
        mean_bytes = float(np.mean([
            sum(b for b, l, h in zip(bytes_per, los, his))]))
        dma = tp.mean() * np.mean(bytes_per)
        rate = dma / 819e9
        print(f"  streaming DMA floor: {dma/1e6:.0f} MB/packet = "
              f"{rate*1e6:.0f} us/packet at 819 GB/s "
              f"(~{1024/rate/1e6:.2f} Mrays/s ceiling from DMA alone)")
        return t_fin

    t_prim = stats(o, d, "primary")

    ok = np.isfinite(t_prim)
    hp = o[ok] + d[ok] * t_prim[ok, None]
    # geometric normals from the winning treelet walk are not tracked
    # here; random-hemisphere bounce around +y suffices for union
    # statistics of a diffuse queue
    rnd = rs.normal(size=(int(ok.sum()), 3)).astype(np.float32)
    rnd /= np.linalg.norm(rnd, axis=1, keepdims=True)
    rnd[:, 1] = np.abs(rnd[:, 1])
    bo = (hp + rnd * 1e-3).astype(np.float32)
    bd = rnd
    key = sort_key(bo, bd, lo, hi)
    srt2 = np.argsort(key, kind="stable")
    t0 = time.time()
    stats(bo[srt2], bd[srt2], "bounce ")
    print(f"({time.time()-t0:.0f}s walk)")


if __name__ == "__main__":
    main()
