#!/usr/bin/env python
"""Minecraft treelet-count / bf16-node A/B (round-5 VERDICT #3).

Finding first (round-5): the per-treelet VMEM driver is the LEAF
tiles (~64 B/tri; 46.5 MB per 600K-tri treelet) — node tiles are
only ~4.5 MB, so halving THEM cannot cut treelet count. What can:
the 600K SRT_TREELET_MAX_TRIS cap itself is conservative vs the
100 MB vmem budget the kernel requests. This probe A/Bs treelet
count 4 (default) vs 2 (max_tris 1.05M, ~51+... -> ~95 MB tables)
with f32 and bf16 node tiles (bf16 buys back the ctile half of the
budget and tests the unpack tax at treelet scale).

One process; scene rebuilt per config (thresholds are build-time).

Usage: python tools/probe_tl_config.py [configs: maxtris,bf16 ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SPP = int(os.environ.get("BENCH_SPP", 128))
DEPTH = int(os.environ.get("BENCH_DEPTH", 10))
RES = int(os.environ.get("BENCH_RES", 1024))
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
    from sycl_ray_tracer_tpu.utils.procgen import minecraft_like_glb

    configs = []
    for a in (sys.argv[1:] or ["600000,0,0", "1050000,0,0",
                               "1050000,1,0", "330000,0,1"]):
        parts = a.split(",")
        mt, bf = int(parts[0]), int(parts[1])
        v8 = int(parts[2]) if len(parts) > 2 else 0
        configs.append((mt, bf, v8))

    host = load_glb(minecraft_like_glb())
    print(f"# minecraft_proc {host.num_triangles} tris, {RES}x{RES} "
          f"spp{SPP} d{DEPTH}", flush=True)
    cam = make_camera(RES, RES, host.camera_position,
                      host.camera_direction, host.camera_focal_length)

    seed = 900
    for mt, bf, v8 in configs:
        os.environ["SRT_TREELET_MAX_TRIS"] = str(mt)
        os.environ["SRT_BF16_NODES"] = str(bf)
        os.environ["SRT_TL_V8"] = str(v8)
        t0 = time.time()
        try:
            scene = build_device_scene(host)
        except Exception as e:
            print(f"maxtris={mt} bf16={bf} BUILD FAILED: "
                  f"{str(e)[:200]}", flush=True)
            continue
        per_tl = ((scene.tl_ctiles.size
                   + (scene.tl_wtiles.size if v8
                      else scene.tl_ltiles.size)) * 4
                  / max(scene.tl_count, 1) / 1e6)
        tag = (f"maxtris={mt} bf16={bf} v8={v8} -> {scene.tl_count} "
               f"treelets ({per_tl:.0f} MB staged each, "
               f"cfmt {scene.cfmt})")
        print(f"{tag}: built in {time.time()-t0:.0f}s", flush=True)
        rates = []
        try:
            for r in range(RUNS + 1):
                seed += 1
                t0 = time.perf_counter()
                img, rays = render_wavefront(
                    scene, cam, width=RES, height=RES, spp=SPP,
                    max_depth=DEPTH, seed=seed)
                np.asarray(img)
                dt = time.perf_counter() - t0
                total = int(np.asarray(rays).astype(np.int64).sum())
                rate = total / dt / 1e6
                note = " (warm-up, discarded)" if r == 0 else ""
                print(f"  run{r}: {dt:.2f}s = {rate:.2f} "
                      f"Mrays/s{note}", flush=True)
                if r > 0:
                    rates.append(rate)
        except Exception as e:
            print(f"{tag} RUN FAILED: {str(e)[:200]}", flush=True)
            continue
        print(f"{tag}: mean {np.mean(rates):.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
