#!/usr/bin/env python
"""Wide-node fanout probe (round-3/4 tree-shape lever): does a BVH12/
BVH16 cut enough packet visits to beat a BVH8, once the kernel's
per-visit cost grows with width?

Uses the numpy walker from tree_quality.py (mirrors the kernel's
traversal order) on width-parameterized trees from the native DP
collapse (srt_bvh_build3). Leaf drains are width-independent in
principle (binary leaves are immutable under the collapse), so the
trade is: internal visits drop vs per-internal-visit cost rising.

Kernel cost model (PLAN_TPU per-visit attribution, v5 kernel):
  node visit  ~ C0 + Cs*ceil(W/8) + Cp*(W/8)^2
      C0 = 200 cyc  amortized readback sync + scalar stack + reduce
      Cs = 130 cyc  slab load+gather+math chain per 8-child block
      Cp =  50 cyc  scalar rank-order push, O(W^2) compares
  leaf drain  ~ Cl = 450 cyc  (8-tri MT block ~2x a slab block)
The model is for RANKING, not absolute rates (the walker's unions
run higher than the kernel's measured U — different tie-breaks and
t evolution); the decision number is the predicted ratio.

Usage: python tools/probe_tree_width.py [scene] [n_packets] [widths..]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("SRT_PLATFORM", "cpu")

import numpy as np

from tree_quality import P, Tree, morton3, sort_key, walk_packet
from sycl_ray_tracer_tpu.ops import sah
from sycl_ray_tracer_tpu.utils.gltf import load_glb
from sycl_ray_tracer_tpu.utils import procgen

C0, CS, CP, CL = 200.0, 130.0, 50.0, 450.0


def model_cycles(w, visits, drains):
    blocks = -(-w // 8)  # ceil
    return (visits * (C0 + CS * blocks + CP * (w / 8.0) ** 2)
            + drains * CL)


def main():
    scene = sys.argv[1] if len(sys.argv) > 1 else "sponza_proc"
    n_pk = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    widths = ([int(a) for a in sys.argv[3:]] if len(sys.argv) > 3
              else [8, 12, 16])
    if scene == "sponza_proc":
        glb = procgen.sponza_like_glb(scale=2)
    elif scene == "minecraft_proc":
        glb = procgen.minecraft_like_glb()
    else:
        raise SystemExit("unknown scene: " + scene)
    host = load_glb(glb)
    tri = host.tri_v
    print(f"{scene}: {tri.shape[0]} tris; widths {widths}")
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

    rows = {}
    bounce_rays = None
    for w in widths:
        b = sah.build_sah(tri, 8, spatial=False, width=w)
        if b is None:
            raise SystemExit("native builder lacks srt_bvh_build3 — "
                             "rebuild native/ (make)")
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

        if bounce_rays is None:
            # derive ONCE (from the first width) so every width walks
            # identical bounce rays — hit sets are identical anyway
            # (verified below via hit_id checksum), but RNG draws stay
            # shared by construction.
            ok = hit_id >= 0
            hp = o[ok] + d[ok] * hit_t[ok, None]
            tv = tri[hit_id[ok]]
            nrm = np.cross(tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0])
            nrm /= np.maximum(
                np.linalg.norm(nrm, axis=1, keepdims=True), 1e-12)
            nrm *= -np.sign((nrm * d[ok]).sum(1, keepdims=True))
            rnd = rs.normal(size=(ok.sum(), 3)).astype(np.float32)
            rnd /= np.linalg.norm(rnd, axis=1, keepdims=True)
            bd = nrm + rnd
            bd /= np.maximum(
                np.linalg.norm(bd, axis=1, keepdims=True), 1e-9)
            bo = (hp + nrm * 1e-3).astype(np.float32)
            bd = bd.astype(np.float32)
            k2 = sort_key(bo, bd, lo, hi)
            srt2 = np.argsort(k2, kind="stable")
            bounce_rays = (bo[srt2], bd[srt2])
            ref_hits = hit_id.copy()
        else:
            miss = (hit_id < 0) != (ref_hits < 0)
            assert not miss.any(), "hit sets diverged across widths"

        bo, bd = bounce_rays
        nb = bo.shape[0] // P
        vis = dra = 0
        for pk in range(nb):
            s = slice(pk * P, (pk + 1) * P)
            v_, d_, _, _ = walk_packet(tr, bo[s], bd[s])
            vis += v_
            dra += d_
        bounce = (vis / nb, dra / nb)
        dt = time.time() - t0
        rows[w] = (prim, bounce)
        print(f"W={w}: ni={b.num_internal} leaves={b.num_leaves} "
              f"depth={b.depth}  ({dt:.0f}s)")
        print(f"  primary: {prim[0]:7.1f} visits + {prim[1]:7.1f} "
              f"drains /packet")
        print(f"  bounce : {bounce[0]:7.1f} visits + {bounce[1]:7.1f} "
              f"drains /packet")

    print("\nmodel-predicted kernel cycles/packet (ratio vs W=8):")
    for phase, i in (("primary", 0), ("bounce", 1)):
        base = model_cycles(8, *rows[widths[0]][i]) if widths[0] == 8 \
            else None
        for w in widths:
            v, dr = rows[w][i]
            c = model_cycles(w, v, dr)
            rel = f"  {c / base:5.3f}x" if base else ""
            print(f"  {phase} W={w:2d}: {c / 1e3:8.1f} Kcyc "
                  f"(V={v:.0f}, D={dr:.0f}){rel}")


if __name__ == "__main__":
    main()
