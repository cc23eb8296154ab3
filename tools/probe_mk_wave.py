#!/usr/bin/env python
"""A/B the MEGAKERNEL wave size (SRT_WAVE_RAYS) at the 512^2 matrix
headline config.

Follow-up to tools/probe_wave_size.py (wavefront: whole-frame waves
won +11% — the compaction sort's pool size sets bounce coherence).
The megakernel's in-program re-sort (SRT_MK_SORT) pools over its wave
lanes the same way, but its wave is additionally capped by the
watchdog lane-bounce guard (SRT_MK_LANE_BOUNCES // (pixels x chunk)),
so at 512^2 d10 chunk=3 the ceiling is ~81 spp/wave: 8M -> 30 spp,
16M -> 61, 32M/64M -> 81 (lane-capped).

Same methodology as probe_wave_size.py: one process, fresh seeds,
np.asarray fence, run 0 per config discarded.

Usage: python tools/probe_mk_wave.py [sizes-in-Mrays ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SPP = int(os.environ.get("BENCH_SPP", 128))
DEPTH = int(os.environ.get("BENCH_DEPTH", 10))
RES = int(os.environ.get("BENCH_RES", 512))
RUNS = int(os.environ.get("BENCH_RUNS", 2))


def main():
    import numpy as np
    import jax

    if os.environ.get("SRT_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["SRT_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))

    from sycl_ray_tracer_tpu.models.camera import make_camera
    from sycl_ray_tracer_tpu.models.megakernel import render_megakernel
    from sycl_ray_tracer_tpu.models.scene import build_device_scene
    from sycl_ray_tracer_tpu.utils.gltf import load_glb
    from sycl_ray_tracer_tpu.utils.procgen import sponza_like_glb

    sizes_m = [int(x) for x in (sys.argv[1:] or ["8", "16", "32"])]

    host = load_glb(sponza_like_glb(scale=2))
    scene = build_device_scene(host)
    jax.block_until_ready(scene.bvh_nodes)
    cam = make_camera(RES, RES, host.camera_position,
                      host.camera_direction, host.camera_focal_length)
    print(f"# scene {host.num_triangles} tris, megakernel {RES}^2 "
          f"spp{SPP} d{DEPTH}, device {jax.devices()[0]}", flush=True)

    seed = 200  # fresh seed for EVERY run of every config (memoization)
    for m in sizes_m:
        os.environ["SRT_WAVE_RAYS"] = str(m << 20)
        rates = []
        try:
            for r in range(RUNS + 1):
                seed += 1
                t0 = time.perf_counter()
                img, rays = render_megakernel(
                    scene, cam, width=RES, height=RES, spp=SPP,
                    max_depth=DEPTH, seed=seed)
                np.asarray(img)
                dt = time.perf_counter() - t0
                total = int(np.asarray(rays).astype(np.int64).sum())
                rate = total / dt / 1e6
                tag = " (warm-up, discarded)" if r == 0 else ""
                print(f"wave={m}M run{r}: {total} rays {dt:.2f}s "
                      f"= {rate:.2f} Mrays/s{tag}", flush=True)
                if r > 0:
                    rates.append(rate)
        except Exception as e:
            print(f"wave={m}M FAILED: {str(e)[:200]}", flush=True)
            continue
        print(f"wave={m}M: mean {np.mean(rates):.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
