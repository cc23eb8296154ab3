#!/usr/bin/env python
"""Tree-quality A/B without TPU time: measures the per-packet visit
UNION (internal-node visits + leaf drains per 1024-ray packet) that
the Pallas packet kernel pays, via a numpy walker that mirrors the
kernel's traversal order (near-first pops, t-pruned pushes, full-leaf
MT drains). The kernel's cost model is U x ~450 cycles (PLAN_TPU
roofline), so a U reduction here converts ~1:1 into kernel rate.

Usage: python tools/tree_quality.py [scene] [n_packets]
  scene: sponza_proc (default) | minecraft_proc | cube
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("SRT_PLATFORM", "cpu")

import numpy as np

from sycl_ray_tracer_tpu.ops import sah
from sycl_ray_tracer_tpu.utils.gltf import load_glb
from sycl_ray_tracer_tpu.utils import procgen

_INF = np.float32(3.0e38)
P = 1024  # kernel packet size


class Tree:
    def __init__(self, tri, bvh):
        self.ni = bvh.num_internal
        self.k = bvh.leaf_size
        w = bvh.children.shape[1] // 6
        self.boxes = bvh.children.reshape(self.ni, 6, w)
        self.ids = bvh.child_ids
        rows = sah.leaf_rows(tri, bvh.order, self.k)
        L = rows.shape[0]
        r = rows.reshape(L, 9, self.k)
        self.v0 = r[:, 0:3]  # [L, 3, K]
        self.e1 = r[:, 3:6]
        self.e2 = r[:, 6:9]
        self.order = bvh.order
        self.pad = bvh.order.reshape(L, self.k) < 0  # [L, K]


def walk_packet(tr, o, d):
    """Union walk of one packet. Returns (node_visits, leaf_drains,
    t, tri) with t/tri the packet's final hits (original tri ids)."""
    n = o.shape[0]
    invd = np.where(np.abs(d) > 1e-12, 1.0 / d, np.float32(1e12))
    t = np.full(n, np.inf, np.float32)
    hit = np.full(n, -1, np.int64)
    stack = [(0, 0.0)]
    visits = drains = 0
    while stack:
        node, _ = stack.pop()
        if node < tr.ni:
            visits += 1
            b = tr.boxes[node]  # [6, 8]
            t0 = (b[0:3][None] - o[:, :, None]) * invd[:, :, None]
            t1 = (b[3:6][None] - o[:, :, None]) * invd[:, :, None]
            near = np.minimum(t0, t1).max(1)  # [n, 8]
            far = np.maximum(t0, t1).min(1)
            ok = (near <= far) & (far >= 0) & (near < t[:, None])
            anyhit = ok.any(0)
            mean_near = np.where(ok, near, np.inf).min(0)
            # far-first push => near-first pop (kernel's rank order)
            for j in np.argsort(-mean_near):
                if anyhit[j] and tr.boxes[node, 0, j] < _INF:
                    stack.append((int(tr.ids[node, j]),
                                  float(mean_near[j])))
        else:
            drains += 1
            leaf = node - tr.ni
            v0, e1, e2 = tr.v0[leaf], tr.e1[leaf], tr.e2[leaf]
            pv = np.cross(d[:, None, :], e2.T[None], axis=2)
            det = (pv * e1.T[None]).sum(2)
            inv = np.where(np.abs(det) > 1e-12, 1.0 / det, 0.0)
            tv = o[:, None, :] - v0.T[None]
            u = (tv * pv).sum(2) * inv
            qv = np.cross(tv, e1.T[None], axis=2)
            v = (qv * d[:, None, :]).sum(2) * inv
            tt = (qv * e2.T[None]).sum(2) * inv
            good = ((np.abs(det) > 1e-12) & (u >= 0) & (v >= 0)
                    & (u + v <= 1) & (tt > 1e-4)
                    & ~tr.pad[leaf][None])
            tt = np.where(good, tt, np.inf).astype(np.float32)
            j = tt.argmin(1)
            tb = tt[np.arange(n), j]
            upd = tb < t
            t = np.where(upd, tb, t)
            hit = np.where(upd, tr.order[leaf * tr.k + j], hit)
    return visits, drains, t, hit


def morton3(x, y, z, bits=10):
    out = np.zeros_like(x, np.uint64)
    for i in range(bits):
        out |= ((x >> i) & 1).astype(np.uint64) << np.uint64(3 * i + 2)
        out |= ((y >> i) & 1).astype(np.uint64) << np.uint64(3 * i + 1)
        out |= ((z >> i) & 1).astype(np.uint64) << np.uint64(3 * i)
    return out


def sort_key(o, d, lo, hi):
    """dir6 + origin-morton, the production compaction key's shape."""
    dom = np.abs(d).argmax(1)
    axis6 = dom * 2 + (np.take_along_axis(
        d, dom[:, None], 1)[:, 0] < 0)
    q = np.clip((o - lo) / np.maximum(hi - lo, 1e-9) * 1023, 0,
                1023).astype(np.uint64)
    return (axis6.astype(np.uint64) << np.uint64(30 + 30)) | morton3(
        q[:, 0], q[:, 1], q[:, 2])


def main():
    scene = sys.argv[1] if len(sys.argv) > 1 else "sponza_proc"
    n_pk = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    if scene == "sponza_proc":
        glb = procgen.sponza_like_glb(scale=2)
    elif scene == "minecraft_proc":
        glb = procgen.minecraft_like_glb()
    else:
        raise SystemExit("unknown scene: " + scene)
    host = load_glb(glb)
    tri = host.tri_v
    print(f"{scene}: {tri.shape[0]} tris")
    lo = tri.reshape(-1, 3).min(0)
    hi = tri.reshape(-1, 3).max(0)

    rs = np.random.RandomState(7)
    res = 1024
    n = n_pk * P
    # primary rays from the scene camera (simple pinhole is enough
    # for union statistics; production camera adds jitter only)
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
    # primaries arrive pixel-morton sorted in production
    q = np.clip(pix * (1024 // res), 0, 1023).astype(np.uint64)
    key = morton3(q[:, 0], q[:, 1], np.zeros(n, np.uint64))
    srt = np.argsort(key, kind="stable")
    o, d = o[srt], d[srt]

    results = {}
    for sp in (False, True):
        b = sah.build_sah(tri, 8, spatial=sp)
        sah.validate(b, tri)
        tr = Tree(tri, b)
        t0 = time.time()
        vis = dra = 0
        hit_t = np.empty(n, np.float32)
        hit_id = np.empty(n, np.int64)
        for pk in range(n_pk):
            s = slice(pk * P, (pk + 1) * P)
            v_, d_, tt, hh = walk_packet(tr, o[s], d[s])
            vis += v_
            dra += d_
            hit_t[s] = tt
            hit_id[s] = hh
        prim = (vis / n_pk, dra / n_pk)

        # diffuse bounce rays from the primary hits, prod-sorted
        ok = hit_id >= 0
        hp = o[ok] + d[ok] * hit_t[ok, None]
        tv = tri[hit_id[ok]]
        nrm = np.cross(tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0])
        nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True),
                          1e-12)
        nrm *= -np.sign((nrm * d[ok]).sum(1, keepdims=True))
        rnd = rs.normal(size=(ok.sum(), 3)).astype(np.float32)
        rnd /= np.linalg.norm(rnd, axis=1, keepdims=True)
        bd = nrm + rnd
        bd /= np.maximum(np.linalg.norm(bd, axis=1, keepdims=True),
                         1e-9)
        bo = (hp + nrm * 1e-3).astype(np.float32)
        bd = bd.astype(np.float32)
        key = sort_key(bo, bd, lo, hi)
        srt2 = np.argsort(key, kind="stable")
        bo, bd = bo[srt2], bd[srt2]
        nb = (bo.shape[0] // P)
        vis = dra = 0
        for pk in range(nb):
            s = slice(pk * P, (pk + 1) * P)
            v_, d_, _, _ = walk_packet(tr, bo[s], bd[s])
            vis += v_
            dra += d_
        bounce = (vis / nb, dra / nb)
        dt = time.time() - t0
        results[sp] = (prim, bounce)
        print(f"spatial={sp}: ni={b.num_internal} leaves="
              f"{b.num_leaves} refs={b.num_refs} depth={b.depth}")
        print(f"  primary U: {prim[0]:.1f} visits + {prim[1]:.1f} "
              f"drains /packet")
        print(f"  bounce  U: {bounce[0]:.1f} visits + {bounce[1]:.1f} "
              f"drains /packet   ({dt:.0f}s, {nb} bounce packets)")
    for phase, i in (("primary", 0), ("bounce", 1)):
        a = sum(results[False][i])
        bq = sum(results[True][i])
        print(f"{phase}: {a:.0f} -> {bq:.0f}  "
              f"({(1 - bq / a) * 100:+.1f}% fewer)")


if __name__ == "__main__":
    main()
