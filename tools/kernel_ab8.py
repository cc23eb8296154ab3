#!/usr/bin/env python
"""A/B: v5 (VPU MT drains) vs v8 (batched MXU Woop drains) on the
production SAH scene (sponza_proc), primary + sorted-bounce
workloads, real TPU. Also the first at-scale compile check for the
~64 MB woop table (2 leaves/tile; VMEM staging is per-program).

Usage: python tools/kernel_ab8.py [specs] [rb list]
  specs: comma list, e.g. v5-k2-m3,v8-k2-b8   (kN=ki, mN=ml, bN=kb)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))

from sycl_ray_tracer_tpu.models.camera import make_camera, generate_rays
from sycl_ray_tracer_tpu.ops import rng as _rng
from sycl_ray_tracer_tpu.ops import sah
from sycl_ray_tracer_tpu.ops import woop
from sycl_ray_tracer_tpu.ops import wbvh
from sycl_ray_tracer_tpu.ops.lbvh import morton30
from sycl_ray_tracer_tpu.ops.vec import V3, normalize
from sycl_ray_tracer_tpu.utils.gltf import load_glb
from sycl_ray_tracer_tpu.utils.procgen import sponza_like_glb

N, RES = 1 << 20, 1024


def main():
    specs = (sys.argv[1] if len(sys.argv) > 1
             else "v5-k2-m3,v8-k2-b8").split(",")
    rbs = [int(x) for x in
           (sys.argv[2] if len(sys.argv) > 2 else "8").split(",")]

    host = load_glb(sponza_like_glb(scale=2))
    t0 = time.perf_counter()
    sahb = sah.build_sah(host.tri_v, 8)
    assert sahb is not None
    rows = sah.leaf_rows(host.tri_v, sahb.order, 8)
    ct_np, lt_np = wbvh.pack_tiles_np(sahb.children, sahb.child_ids,
                                      rows, 8)
    wt_np = woop.pack_wtiles_affine_np(rows)
    print(f"# {host.num_triangles} tris, build+pack "
          f"{time.perf_counter()-t0:.1f}s; ctiles "
          f"{ct_np.nbytes/1e6:.1f} MB ltiles {lt_np.nbytes/1e6:.1f} "
          f"MB wtiles {wt_np.nbytes/1e6:.1f} MB", file=sys.stderr)
    ct = jnp.asarray(ct_np)
    lt = jnp.asarray(lt_np)
    wt = jnp.asarray(wt_np)
    ni, k = sahb.num_internal, 8

    cam = make_camera(RES, RES, host.camera_position,
                      host.camera_direction, host.camera_focal_length)
    lane = jnp.arange(N, dtype=jnp.uint32)
    px = (lane % jnp.uint32(RES)).astype(jnp.int32)
    py = (lane // jnp.uint32(RES)).astype(jnp.int32)
    lo = jnp.asarray(host.tri_v.reshape(-1, 3).min(0))
    hi = jnp.asarray(host.tri_v.reshape(-1, 3).max(0))

    def prim(seed):
        key = _rng.make_key(jnp.uint32(seed), lane)
        o, d = generate_rays(cam, px, py, key)
        jax.block_until_ready((o.x, d.x))
        return o, d, key

    @jax.jit
    def mkbounce(o, d, key, t, tri):
        tt = jnp.where(tri >= 0, t, 1.0)
        new_o = V3(o.x + d.x * tt, o.y + d.y * tt, o.z + d.z * tt)
        u = _rng.uniform3(key, jnp.uint32(77))
        nd = normalize(V3(u[0] * 2 - 1, u[1] * 2 - 1, u[2] * 2 - 1),
                       eps=1e-9)
        oct_ = ((nd.x < 0).astype(jnp.uint32) << 2
                | (nd.y < 0).astype(jnp.uint32) << 1
                | (nd.z < 0).astype(jnp.uint32))
        p = jnp.stack([new_o.x, new_o.y, new_o.z], -1)
        m = morton30(p, lo, hi) >> jnp.uint32(3)
        perm = jnp.argsort((oct_ << jnp.uint32(27)) | m)
        tk = lambda a: jnp.take(a, perm)
        return (V3(tk(new_o.x), tk(new_o.y), tk(new_o.z)),
                V3(tk(nd.x), tk(nd.y), tk(nd.z)))

    from sycl_ray_tracer_tpu.ops.traverse_pallas5 import traverse_packets5
    from sycl_ray_tracer_tpu.ops.traverse_pallas8 import traverse_packets8

    def make_impl(spec):
        kw = {}
        for part in spec.split("-")[1:]:
            if part.startswith("k"):
                kw["ki"] = int(part[1:])
            elif part.startswith("m"):
                kw["ml"] = int(part[1:])
            elif part.startswith("b"):
                kw["kb"] = int(part[1:])
            elif part.startswith("p"):
                kw["dotp"] = part[1:]  # e.g. -pf32x3, -pbf16
        if spec.startswith("v8"):
            return lambda o, d, rows=8: traverse_packets8(
                ct, wt, ni, k, o, d, rows=rows, **kw)
        if spec.startswith("v6"):
            from sycl_ray_tracer_tpu.ops.traverse_pallas6 import (
                traverse_packets6)
            kw.setdefault("ml", 2)
            return lambda o, d, rows=8: traverse_packets6(
                ct, lt, ni, k, o, d, **kw)
        return lambda o, d, rows=8: traverse_packets5(
            ct, lt, ni, k, o, d, rows=rows, **kw)

    impls = {s: make_impl(s) for s in specs}

    seeds = list(range(5))
    prims = [prim(s)[:2] for s in seeds]
    bn = []
    for s in seeds:
        o_, d_, k_ = prim(s)
        h = traverse_packets5(ct, lt, ni, k, o_, d_)
        bn.append(mkbounce(o_, d_, k_, h.t, h.tri))
    jax.block_until_ready([b[0].x for b in bn])
    workloads = {"primary": prims, "bounce": bn}

    # agreement: v8 vs v5 on one primary + one bounce set (Woop vs MT
    # algebra => float-noise tri flips at edges, t to ~1e-3 rel)
    ref = None
    for s in specs:
        if s.startswith("v5"):
            ref = s
            break
    if ref is not None:
        for wname, sets in workloads.items():
            h5 = impls[ref](*sets[0])
            for s in specs:
                if s == ref:
                    continue
                hx = impls[s](*sets[0])
                t5 = np.asarray(h5.t)
                tx = np.asarray(hx.t)
                same = (np.asarray(h5.tri) == np.asarray(hx.tri)).mean()
                m5 = np.asarray(h5.tri) >= 0
                mx = np.asarray(hx.tri) >= 0
                both = m5 & mx
                rel = (np.abs(t5[both] - tx[both])
                       / np.maximum(np.abs(t5[both]), 1e-3)).max() \
                    if both.any() else 0.0
                print(f"# {wname}: {ref}/{s} tri agreement "
                      f"{same*100:.3f}%  miss mismatch "
                      f"{(m5 != mx).mean()*100:.4f}%  max rel dt "
                      f"{rel:.2e}")

    for wname, sets in workloads.items():
        for rb in rbs:
            for s in specs:
                fn = impls[s]
                out = fn(*sets[0], rows=rb)
                _ = np.asarray(out.t[:8])
                ts = []
                for i in (1, 2, 3, 4):
                    t0 = time.perf_counter()
                    out = fn(*sets[i], rows=rb)
                    _ = np.asarray(out.t[:8])
                    ts.append(time.perf_counter() - t0)
                dt = min(ts)
                print(f"{wname:8s} rb{rb} {s:12s}: {dt*1e3:8.1f} ms  "
                      f"{N/dt/1e6:6.2f} Mrays/s")


if __name__ == "__main__":
    main()
