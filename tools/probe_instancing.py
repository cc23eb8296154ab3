#!/usr/bin/env python
"""Measure the baked-instancing blow-up (round-4 VERDICT #6).

Ingest bakes every glTF instance to world space (utils/gltf.py), so R
instances of one 12-tri cube cost R x geometry in host arrays, BVH
build time, and device tables — where the reference shares one Embree
BLAS per primitive and pays ~1x geometry plus R transforms
(/root/reference/src/scene.cpp:435-439, 487-493).

Prints, per R: triangle count, HostScene bytes, DeviceScene bytes
(sum of uploaded array nbytes), load+build wall seconds, and the
derived bytes/triangle (feeding the 540-910 B/tri band the pre-OOM
guard in models/scene.py uses: hard-fail on the 540 lower bound on
TPU, warn in the band). CPU-only; run with SRT_PLATFORM=cpu.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402

if os.environ.get("SRT_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["SRT_PLATFORM"])

import numpy as np  # noqa: E402


def nbytes_tree(tree) -> int:
    leaves = jax.tree_util.tree_leaves(tree)
    return int(sum(getattr(x, "nbytes", 0) for x in leaves))


def host_bytes(host) -> int:
    return int(host.tri_v.nbytes + host.tri_n.nbytes
               + host.tri_uv.nbytes + host.tri_mat.nbytes
               + host.textures.nbytes)


def main():
    from sycl_ray_tracer_tpu.models.scene import build_device_scene
    from sycl_ray_tracer_tpu.utils.fixtures import instanced_scene_glb
    from sycl_ray_tracer_tpu.utils.gltf import load_glb

    rs = [int(a) for a in sys.argv[1:]] or [100, 1000, 10000, 40000]
    print(f"{'R':>7} {'tris':>9} {'host MB':>9} {'device MB':>10} "
          f"{'B/tri':>6} {'load+build s':>12}")
    for r in rs:
        t0 = time.perf_counter()
        host = load_glb(instanced_scene_glb(r))
        scene = build_device_scene(host, leaf_size=8)
        jax.block_until_ready(jax.tree_util.tree_leaves(scene))
        dt = time.perf_counter() - t0
        hb = host_bytes(host)
        db = nbytes_tree(scene)
        print(f"{r:>7} {host.num_triangles:>9} {hb/1e6:>9.1f} "
              f"{db/1e6:>10.1f} {db/max(host.num_triangles,1):>6.0f} "
              f"{dt:>12.2f}")
        del host, scene


if __name__ == "__main__":
    main()
