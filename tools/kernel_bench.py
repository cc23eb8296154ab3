#!/usr/bin/env python
"""A/B benchmark: v1 vs v2 packet traversal on real TPU.

Workloads: coherent primaries and sorted diffuse-like bounce rays on
sponza_proc. Run: python tools/kernel_bench.py [n_rays_log2]
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))

from sycl_ray_tracer_tpu.models.camera import make_camera, generate_rays
from sycl_ray_tracer_tpu.ops import rng as _rng
from sycl_ray_tracer_tpu.ops import wbvh
from sycl_ray_tracer_tpu.ops.vec import V3, normalize
from sycl_ray_tracer_tpu.utils.gltf import load_glb
from sycl_ray_tracer_tpu.utils.procgen import sponza_like_glb


def timed(fn, reps=3):
    ts = []
    out = None
    for i in range(reps + 1):
        t0 = time.perf_counter()
        out = fn(i)
        jax.block_until_ready(out)
        if i:
            ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    n_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n_rays = 1 << n_log2
    res = int(np.sqrt(n_rays))

    host = load_glb(sponza_like_glb(scale=2))
    print(f"# scene {host.num_triangles} tris", file=sys.stderr)
    t0 = time.perf_counter()
    bvh, sorted_v, _ = wbvh.build_np(host.tri_v, 8)
    ids = wbvh.heap_child_ids_np(bvh.num_internal)
    ct, lt = wbvh.pack_tiles_np(bvh.children, ids, bvh.leaves, 8)
    print(f"# host build+pack {time.perf_counter()-t0:.2f}s  ni "
          f"{bvh.num_internal} depth {bvh.depth}", file=sys.stderr)

    ni, depth, k = bvh.num_internal, bvh.depth, 8
    children = jnp.asarray(bvh.children)
    leaves = jnp.asarray(bvh.leaves)
    ctiles = jnp.asarray(ct)
    ltiles = jnp.asarray(lt)

    cam = make_camera(res, res, host.camera_position,
                      host.camera_direction, host.camera_focal_length)

    def make_primary(seed):
        lane = jnp.arange(n_rays, dtype=jnp.uint32)
        px = (lane % jnp.uint32(res)).astype(jnp.int32)
        py = (lane // jnp.uint32(res)).astype(jnp.int32)
        key = _rng.make_key(jnp.uint32(seed), lane)
        o, d = generate_rays(cam, px, py, key)
        return o, d, key

    from sycl_ray_tracer_tpu.ops.traverse_pallas import traverse_packets
    from sycl_ray_tracer_tpu.ops.traverse_pallas2 import traverse_packets2
    from sycl_ray_tracer_tpu.models.wavefront import _coherence_key

    @jax.jit
    def bounce_from(o, d, key, hit_t, hit_tri):
        # diffuse-like: new origin at hit point, cosine-ish dir via
        # normal + random unit vector (matching the estimator's moves)
        t = jnp.where(hit_tri >= 0, hit_t, 1.0)
        new_o = o + d * t
        u = _rng.uniform3(key, jnp.uint32(77))
        nd = normalize(V3(u[0] * 2 - 1, u[1] * 2 - 1, u[2] * 2 - 1),
                       eps=1e-9)
        # sort by the wavefront's coherence key
        lo = jnp.asarray(host.tri_v.reshape(-1, 3).min(0))
        hi = jnp.asarray(host.tri_v.reshape(-1, 3).max(0))
        from sycl_ray_tracer_tpu.ops.lbvh import morton30
        oct_ = ((nd.x < 0).astype(jnp.uint32) << 2
                | (nd.y < 0).astype(jnp.uint32) << 1
                | (nd.z < 0).astype(jnp.uint32))
        p = jnp.stack([new_o.x, new_o.y, new_o.z], axis=-1)
        m = morton30(p, lo, hi) >> jnp.uint32(3)
        keysort = (oct_ << jnp.uint32(27)) | m
        perm = jnp.argsort(keysort)
        take = lambda a: jnp.take(a, perm)
        return (V3(take(new_o.x), take(new_o.y), take(new_o.z)),
                V3(take(nd.x), take(nd.y), take(nd.z)))

    os0, ds0, key0 = make_primary(0)
    h0 = traverse_packets(children, leaves, ni, depth, k, os0, ds0)
    jax.block_until_ready(h0.t)
    ob, db = bounce_from(os0, ds0, key0, h0.t, h0.tri)

    variants = {}
    variants["v1 rows32"] = lambda o, d: traverse_packets(
        children, leaves, ni, depth, k, o, d)
    for rb in (1, 2, 4, 8):
        variants[f"v2 rb{rb}"] = (
            lambda o, d, rb=rb: traverse_packets2(
                ctiles, ltiles, ni, k, o, d, rows=rb))

    prim = [make_primary(s)[:2] for s in range(4)]
    for name, fn in variants.items():
        dt, out = timed(lambda i: fn(*prim[i % 4]))
        # correctness spot-check vs v1 on the same rays
        mr = n_rays / dt / 1e6
        print(f"primary  {name:10s}: {dt*1e3:8.2f} ms  {mr:7.2f} Mrays/s")

    bnc = []
    for s in range(4):
        o_, d_, k_ = make_primary(s)
        h_ = traverse_packets(children, leaves, ni, depth, k, o_, d_)
        bnc.append(bounce_from(o_, d_, k_, h_.t, h_.tri))
    jax.block_until_ready(bnc)
    for name, fn in variants.items():
        dt, out = timed(lambda i: fn(*bnc[i % 4]))
        mr = n_rays / dt / 1e6
        print(f"bounce   {name:10s}: {dt*1e3:8.2f} ms  {mr:7.2f} Mrays/s")

    # agreement check v1 vs v2 on primaries
    h1 = variants["v1 rows32"](*prim[0])
    h2 = variants["v2 rb2"](*prim[0])
    same = (np.asarray(h1.tri) == np.asarray(h2.tri))
    print(f"# v1 vs v2 tri agreement: {same.mean()*100:.4f}%")


if __name__ == "__main__":
    main()
