#!/usr/bin/env python
"""Per-shard cost of the SHARDED CHUNKED MEGAKERNEL (round-5 VERDICT
#5): the round-3 measurement that gave the wavefront fast path its
1.02x per-shard factor, repeated for the megakernel hostloop
(parallel/mesh.py:_render_sharded_megakernel_hostloop).

Method (identical to the round-3 wavefront row): a 1-core CPU host
serializes the 8 virtual shards, so sharded_wall / 8 approximates one
shard's cost; compare against the single-chip engine at the same
per-shard workload (spp=1). Both run the SAME cadence (forced via
SRT_MK_CHUNK/SRT_MK_SORT so the CPU default doesn't diverge).

Run: python tools/probe_shard_cost_mk.py [res] [spp_per_shard]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8"
                           ).strip()
os.environ.setdefault("SRT_MK_CHUNK", "2")
os.environ.setdefault("SRT_MK_SORT", "2")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))

from sycl_ray_tracer_tpu.models.camera import make_camera
from sycl_ray_tracer_tpu.models.scene import build_device_scene
from sycl_ray_tracer_tpu.models.megakernel import render_megakernel
from sycl_ray_tracer_tpu.parallel.mesh import make_mesh, render_sharded
from sycl_ray_tracer_tpu.utils.fixtures import cube_scene_glb
from sycl_ray_tracer_tpu.utils.gltf import load_glb


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    sps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    depth = 8
    host = load_glb(cube_scene_glb())
    scene = build_device_scene(host)
    cam = make_camera(res, res, host.camera_position,
                      host.camera_direction, host.camera_focal_length)
    mesh = make_mesh(dp=8, devices=jax.devices()[:8])

    def timed(fn, label):
        fn(0)  # compile
        ts = []
        for s in (1, 2):
            t0 = time.perf_counter()
            img, rays = fn(s)
            np.asarray(img)
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        print(f"{label}: {dt:.2f}s  (runs {[f'{t:.2f}' for t in ts]})")
        return dt

    single = timed(
        lambda s: render_megakernel(
            scene, cam, width=res, height=res, spp=sps,
            max_depth=depth, seed=s),
        f"single-chip megakernel {res}^2 spp{sps} d{depth}")

    sharded = timed(
        lambda s: render_sharded(
            scene, cam, width=res, height=res, spp=8 * sps,
            max_depth=depth, seed=s, mesh=mesh,
            renderer="megakernel"),
        f"sharded dp8 megakernel {res}^2 spp{8*sps} d{depth}")

    ratio = sharded / 8 / single
    print(f"per-shard cost: {sharded:.2f}/8 = {sharded/8:.2f}s vs "
          f"single {single:.2f}s -> {ratio:.2f}x "
          f"({'PASS' if ratio <= 1.3 else 'FAIL'} at the <=1.3x "
          f"round-3 gate)")


if __name__ == "__main__":
    main()
