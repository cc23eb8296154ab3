#!/usr/bin/env python
"""A/B timing of packet-traversal kernel versions on the production
SAH scene (sponza_proc), primary + sorted-bounce workloads, real TPU.

Usage: python tools/kernel_ab.py [v2,v3] [rb list, e.g. 2,4,8]
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
from sycl_ray_tracer_tpu.models.scene import build_device_scene
from sycl_ray_tracer_tpu.ops import rng as _rng
from sycl_ray_tracer_tpu.ops.lbvh import morton30
from sycl_ray_tracer_tpu.ops.vec import V3, normalize
from sycl_ray_tracer_tpu.utils.gltf import load_glb
from sycl_ray_tracer_tpu.utils.procgen import sponza_like_glb

N, RES = 1 << 20, 1024


def main():
    vers = (sys.argv[1] if len(sys.argv) > 1 else "v2,v3").split(",")
    rbs = [int(x) for x in
           (sys.argv[2] if len(sys.argv) > 2 else "2,8").split(",")]

    host = load_glb(sponza_like_glb(scale=2))
    scene = build_device_scene(host)
    assert scene.has_sah
    ct, lt, ni, k = (scene.bvh_ctiles, scene.bvh_ltiles,
                     scene.sah_ni, scene.leaf_size)

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

    from sycl_ray_tracer_tpu.ops.traverse_pallas2 import traverse_packets2
    from sycl_ray_tracer_tpu.ops.traverse_pallas5 import traverse_packets5

    from sycl_ray_tracer_tpu.ops.traverse_pallas6 import traverse_packets6

    def make_impl(spec):
        # "v2" | "v5" | "v5-k3-m4" (ki=3, ml=4) | "v6-k2-m2"
        # (v7, the W-walk probe generation, was retired after its
        # round-3 NO-GO; measurements live in PLAN_TPU round-3 facts
        # and the code in git history)
        if spec.startswith(("v5", "v6")):
            fn = traverse_packets6 if spec.startswith("v6") \
                else traverse_packets5
            kw = {}
            for part in spec.split("-")[1:]:
                if part.startswith("k"):
                    kw["ki"] = int(part[1:])
                elif part.startswith("m"):
                    kw["ml"] = int(part[1:])
            return lambda *a, **k: fn(*a, **k, **kw)
        return traverse_packets2

    impls = {v: make_impl(v) for v in vers}

    seeds = list(range(5))
    prims = [prim(s)[:2] for s in seeds]
    bn = []
    for s in seeds:
        o_, d_, k_ = prim(s)
        h = traverse_packets2(ct, lt, ni, k, o_, d_)
        bn.append(mkbounce(o_, d_, k_, h.t, h.tri))
    jax.block_until_ready([b[0].x for b in bn])
    workloads = {"primary": prims, "bounce": bn}

    # agreement check vs v2 on one primary set
    if "v2" in vers:
        h2 = traverse_packets2(ct, lt, ni, k, *prims[0], rows=rbs[0])
        for v in vers:
            if v == "v2":
                continue
            hx = impls[v](ct, lt, ni, k, *prims[0], rows=rbs[0])
            same = (np.asarray(h2.tri) == np.asarray(hx.tri)).mean()
            dt = np.abs(np.asarray(h2.t) - np.asarray(hx.t)).max()
            print(f"# v2/{v} tri agreement: {same*100:.3f}%  "
                  f"max |dt|: {dt:.3g}")

    # NOTE: time with a forced host transfer of a slice; plain
    # block_until_ready under-reports on this backend for pallas
    # outputs (tools/probe_visit_cost.py docstring).
    for wname, sets in workloads.items():
        for rb in rbs:
            for v in vers:
                fn = impls[v]
                out = fn(ct, lt, ni, k, *sets[0], rows=rb)
                _ = np.asarray(out.t[:8])
                ts = []
                for i in (1, 2, 3, 4):
                    t0 = time.perf_counter()
                    out = fn(ct, lt, ni, k, *sets[i], rows=rb)
                    _ = np.asarray(out.t[:8])
                    ts.append(time.perf_counter() - t0)
                dt = min(ts)
                print(f"{wname:8s} rb{rb} {v}: {dt*1e3:8.1f} ms  "
                      f"{N/dt/1e6:6.2f} Mrays/s")


if __name__ == "__main__":
    main()
