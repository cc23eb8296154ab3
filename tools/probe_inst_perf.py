#!/usr/bin/env python
"""Instanced vs baked perf + memory A/B at fixture scale (round-5
VERDICT #6 "Done" row): R instances of the 12-tri cube fixture,
rendered through BOTH ingest paths on TPU, warm runs, device-table
byte accounting.

Usage: python tools/probe_inst_perf.py [R] [res] [spp]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))

from sycl_ray_tracer_tpu.models.camera import make_camera
from sycl_ray_tracer_tpu.models.instanced import (
    build_instanced_device_scene)
from sycl_ray_tracer_tpu.models.scene import build_device_scene
from sycl_ray_tracer_tpu.models.wavefront import render_wavefront
from sycl_ray_tracer_tpu.utils.fixtures import instanced_scene_glb
from sycl_ray_tracer_tpu.utils.instanced import load_glb_instanced


def tables_bytes(s):
    tot = 0
    for name in ("bvh_ctiles", "bvh_ltiles", "bvh_wtiles",
                 "bvh_nodes", "bvh_children", "bvh_leaves",
                 "shade_tbl", "tri_n", "tri_uv", "tri_mat",
                 "bvh_remap"):
        tot += getattr(s, name).size * 4
    if s.has_instances:
        tot += (s.inst_ldesc.size + s.inst_nmat.size) * 4
    return tot


def run(scene, host, res, spp, depth, label):
    cam = make_camera(res, res, host.camera_position,
                      host.camera_direction, host.camera_focal_length)
    rates = []
    for r in range(3):
        t0 = time.perf_counter()
        img, rays = render_wavefront(scene, cam, width=res, height=res,
                                     spp=spp, max_depth=depth,
                                     seed=10 + r)
        np.asarray(img)
        dt = time.perf_counter() - t0
        total = int(np.asarray(rays).astype(np.int64).sum())
        if r:
            rates.append(total / dt / 1e6)
    print(f"{label}: {np.mean(rates):.2f} Mrays/s "
          f"(tables {tables_bytes(scene)/1e6:.1f} MB)", flush=True)
    return np.asarray(img)


def main():
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    spp = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    depth = 8
    glb = instanced_scene_glb(R)
    ih = load_glb_instanced(glb)
    print(f"# R={R}: {ih.num_world_triangles} world tris, "
          f"{ih.num_unique_triangles} unique", flush=True)

    t0 = time.time()
    s_i = build_instanced_device_scene(ih)
    print(f"# instanced build {time.time()-t0:.1f}s "
          f"({s_i.sah_ni} global nodes)", flush=True)
    img_i = run(s_i, ih, res, spp, depth, f"shared R={R}")

    t0 = time.time()
    hb = ih.bake()
    s_b = build_device_scene(hb)
    print(f"# baked build {time.time()-t0:.1f}s", flush=True)
    img_b = run(s_b, hb, res, spp, depth, f"baked  R={R}")

    d = np.abs(img_i.astype(np.float32) - img_b.astype(np.float32))
    print(f"image RMSE {np.sqrt((d**2).mean()):.5f} (gamma [0,1]) "
          f"max {d.max():.4f}")


if __name__ == "__main__":
    main()
