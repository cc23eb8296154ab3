#!/usr/bin/env python
"""Heap-vs-SAH tree A/B on real TPU: visits + wall time per workload."""

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

from sycl_ray_tracer_tpu.ops import wbvh, sah
from sycl_ray_tracer_tpu.ops import rng as _rng
from sycl_ray_tracer_tpu.ops.lbvh import morton30
from sycl_ray_tracer_tpu.ops.traverse_pallas2 import traverse_packets2
from sycl_ray_tracer_tpu.ops.vec import V3, normalize
from sycl_ray_tracer_tpu.models.camera import make_camera, generate_rays
from sycl_ray_tracer_tpu.utils.gltf import load_glb
from sycl_ray_tracer_tpu.utils.procgen import sponza_like_glb


def main():
    host = load_glb(sponza_like_glb(scale=2))
    k = 8
    heap, _, _ = wbvh.build_np(host.tri_v, k)
    hids = wbvh.heap_child_ids_np(heap.num_internal)
    hct, hlt = wbvh.pack_tiles_np(heap.children, hids, heap.leaves, k)

    sb = sah.build_sah(host.tri_v, k)
    sct, slt = wbvh.pack_tiles_np(sb.children, sb.child_ids,
                                  sah.leaf_rows(host.tri_v, sb.order, k),
                                  k)
    trees = {
        "heap": (jnp.asarray(hct), jnp.asarray(hlt), heap.num_internal),
        "sah": (jnp.asarray(sct), jnp.asarray(slt), sb.num_internal),
    }
    print(f"# heap ni {heap.num_internal} depth {heap.depth} | "
          f"sah ni {sb.num_internal} depth {sb.depth} "
          f"leaves {sb.num_leaves}", file=sys.stderr)

    n, res = 1 << 20, 1024
    cam = make_camera(res, res, host.camera_position,
                      host.camera_direction, host.camera_focal_length)
    lane = jnp.arange(n, dtype=jnp.uint32)
    px = (lane % jnp.uint32(res)).astype(jnp.int32)
    py = (lane // jnp.uint32(res)).astype(jnp.int32)

    def prim(seed):
        key = _rng.make_key(jnp.uint32(seed), lane)
        o, d = generate_rays(cam, px, py, key)
        jax.block_until_ready((o.x, d.x))
        return o, d, key

    lo = jnp.asarray(host.tri_v.reshape(-1, 3).min(0))
    hi = jnp.asarray(host.tri_v.reshape(-1, 3).max(0))

    @jax.jit
    def mkbounce(o, d, key, t, tri):
        tt = jnp.where(tri >= 0, t, 1.0)
        new_o = o + d * tt
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

    prims = [prim(s) for s in range(4)]
    hct_, hlt_, hni = trees["heap"]
    bns = []
    for (o_, d_, k_) in prims:
        h = traverse_packets2(hct_, hlt_, hni, k, o_, d_, rows=2)
        bns.append(mkbounce(o_, d_, k_, h.t, h.tri))
    jax.block_until_ready(bns)

    for tname, (ct, lt, ni) in trees.items():
        for wname, sets in [("primary", [p[:2] for p in prims]),
                            ("bounce", bns)]:
            for rb in (2, 4, 8):
                hs = traverse_packets2(ct, lt, ni, k, *sets[0],
                                       rows=rb, stats=True)
                st = np.asarray(hs[1]).reshape(-1, 8, 128)
                vi = st[:, ::rb, 0][:, :8 // rb].astype(np.int64)
                vl = st[:, ::rb, 1][:, :8 // rb].astype(np.int64)
                # time without stats
                h = traverse_packets2(ct, lt, ni, k, *sets[0], rows=rb)
                jax.block_until_ready(h.t)
                ts = []
                for i in (1, 2, 3):
                    t0 = time.perf_counter()
                    h = traverse_packets2(ct, lt, ni, k, *sets[i],
                                          rows=rb)
                    jax.block_until_ready(h.t)
                    ts.append(time.perf_counter() - t0)
                dt = min(ts)
                print(f"{tname:4s} {wname:7s} rb{rb}: union "
                      f"{(vi+vl).mean():7.1f} (i {vi.mean():6.1f} "
                      f"l {vl.mean():6.1f})  {dt*1e3:7.1f} ms  "
                      f"{n/dt/1e6:6.2f} Mrays/s")


if __name__ == "__main__":
    main()
