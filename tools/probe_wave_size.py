#!/usr/bin/env python
"""A/B the wavefront wave size (SRT_WAVE_RAYS) at the headline config.

The 16M default came from the round-1 trend (1M 0.88 / 2M 1.02 /
4M 1.16 / 8M 1.24 Mrays/s — monotone up) but was never swept past 16M.
Two opposing forces above 16M:
  + bigger sorted pools tighten packet coherence (the compaction sort
    groups more rays per dir6_morton cell -> smaller visit unions) and
    amortize fixed per-program cost over more rays;
  - fewer waves starve the SRT_WAVE_THREADS=2 interleave (at 64M the
    whole spp64 frame is ONE wave: no RPC overlap at all).

Methodology per CLAUDE.md: ONE process (axon remote compiles do not
persist across processes), fresh seeds per run, np.asarray fence,
run 0 of each config discarded (new bucket shapes compile lazily).

Usage: python tools/probe_wave_size.py [sizes-in-Mrays ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SPP = int(os.environ.get("BENCH_SPP", 64))
DEPTH = int(os.environ.get("BENCH_DEPTH", 10))
RES = int(os.environ.get("BENCH_RES", 1024))
# non-square override (round-4 VERDICT #7: sweep the 1080p s128 shape
# whose 265M-ray frames hard-fall to 32M waves)
RES_W = int(os.environ.get("BENCH_W", RES))
RES_H = int(os.environ.get("BENCH_H", RES))
RUNS = int(os.environ.get("BENCH_RUNS", 2))


def main():
    import numpy as np
    import jax

    if os.environ.get("SRT_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["SRT_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))

    from sycl_ray_tracer_tpu.models.camera import make_camera
    from sycl_ray_tracer_tpu.models.scene import build_device_scene
    from sycl_ray_tracer_tpu.models.wavefront import render_wavefront
    from sycl_ray_tracer_tpu.utils.gltf import load_glb
    from sycl_ray_tracer_tpu.utils.procgen import sponza_like_glb

    sizes_m = [int(x) for x in (sys.argv[1:] or ["16", "32", "64"])]

    host = load_glb(sponza_like_glb(scale=2))
    scene = build_device_scene(host)
    jax.block_until_ready(scene.bvh_nodes)
    cam = make_camera(RES_W, RES_H, host.camera_position,
                      host.camera_direction, host.camera_focal_length)
    print(f"# scene {host.num_triangles} tris, {RES_W}x{RES_H} "
          f"spp{SPP} d{DEPTH} threads="
          f"{os.environ.get('SRT_WAVE_THREADS', '2')}, "
          f"device {jax.devices()[0]}", flush=True)

    seed = 100  # fresh seed for EVERY run of every config (memoization)
    for m in sizes_m:
        os.environ["SRT_WAVE_RAYS"] = str(m << 20)
        rates = []
        try:
            for r in range(RUNS + 1):
                seed += 1
                t0 = time.perf_counter()
                img, rays = render_wavefront(
                    scene, cam, width=RES_W, height=RES_H, spp=SPP,
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
        except Exception as e:  # e.g. HBM OOM at one-wave sizes
            print(f"wave={m}M FAILED: {str(e)[:200]}", flush=True)
            continue
        print(f"wave={m}M: mean {np.mean(rates):.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
