#!/usr/bin/env python
"""Round-5 VERDICT #2: break the 64M pool wall.

One process (remote compiles don't persist), 1920x1080 s128 d10
(265M-ray frames — the >68M fallback shape), sweeping
(SRT_WAVE_RAYS, SRT_WAVE_THREADS, SRT_F16_QUEUE) combos IN ORDER so
the 64M configs run AFTER the 48M ladders compiled — exactly the
in-process allocator state that RESOURCE_EXHAUSTED'd round 4. A
gc.collect() between configs drops dead ladder buffers.

All three knobs are read at render-call time (wavefront.py), so one
process covers every combo. Run 0 of each config discarded.

Usage: python tools/probe_pool_r5.py [w,t,f16 triples like 48,2,0]
"""

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SPP = int(os.environ.get("BENCH_SPP", 128))
DEPTH = int(os.environ.get("BENCH_DEPTH", 10))
RES_W = int(os.environ.get("BENCH_W", 1920))
RES_H = int(os.environ.get("BENCH_H", 1080))
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

    combos = []
    for a in (sys.argv[1:] or ["48,2,0", "64,1,0", "64,2,0",
                               "64,1,1", "48,2,1"]):
        w, t, f = a.split(",")
        combos.append((int(w), int(t), int(f)))

    host = load_glb(sponza_like_glb(scale=2))
    scene = build_device_scene(host)
    jax.block_until_ready(scene.bvh_nodes)
    cam = make_camera(RES_W, RES_H, host.camera_position,
                      host.camera_direction, host.camera_focal_length)
    print(f"# {host.num_triangles} tris, {RES_W}x{RES_H} spp{SPP} "
          f"d{DEPTH}, device {jax.devices()[0]}", flush=True)

    seed = 500
    for w, t, f in combos:
        os.environ["SRT_WAVE_RAYS"] = str(w << 20)
        os.environ["SRT_WAVE_THREADS"] = str(t)
        os.environ["SRT_F16_QUEUE"] = str(f)
        tag = f"wave={w}M threads={t} f16={f}"
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
                note = " (warm-up, discarded)" if r == 0 else ""
                print(f"{tag} run{r}: {dt:.2f}s = {rate:.2f} "
                      f"Mrays/s{note}", flush=True)
                if r > 0:
                    rates.append(rate)
        except Exception as e:
            print(f"{tag} FAILED: {str(e)[:200]}", flush=True)
            gc.collect()
            continue
        print(f"{tag}: mean {np.mean(rates):.2f} Mrays/s", flush=True)
        gc.collect()


if __name__ == "__main__":
    main()
