#!/usr/bin/env python
"""Per-stage timing of one wavefront bounce on REAL mid-render queue
state (sponza_proc, bench config), real TPU.

Stages timed independently on the same captured queue:
  kernel   intersect_scene (packet traversal)
  shade    shade_lanes + materials.scatter
  key      coherence sort key
  compact  pack + argsort + take (the queue move)
  scatter  accumulator scatter-add

Methodology per CLAUDE.md: fresh inputs per run (seed-varied), sync by
np.asarray of a slice, run 0 discarded.
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

from sycl_ray_tracer_tpu.models import materials as mats
from sycl_ray_tracer_tpu.models import trace as _trace
from sycl_ray_tracer_tpu.models.camera import make_camera
from sycl_ray_tracer_tpu.models.scene import build_device_scene
from sycl_ray_tracer_tpu.models.wavefront import (
    _bounce_step, _compact, _coherence_key, _gen_queue)
from sycl_ray_tracer_tpu.ops import rng as _rng
from sycl_ray_tracer_tpu.ops.vec import V3, normalize
from sycl_ray_tracer_tpu.utils.gltf import load_glb
from sycl_ray_tracer_tpu.utils.procgen import sponza_like_glb

RES = int(os.environ.get("BB_RES", 1024))
CAPTURE_BOUNCE = int(os.environ.get("BB_BOUNCE", 3))
WAVES = int(os.environ.get("BB_WAVES", 8))  # 8M-ray wave at 1024^2
RUNS = int(os.environ.get("BB_RUNS", 3))


def capture_state(scene, cam, seed):
    """Run the real renderer to CAPTURE_BOUNCE and return its queue."""
    key_lane, state = _gen_queue(scene, cam, seed, 0,
                                 width=RES, height=RES, waves=WAVES)
    ks = (jnp.uint32(seed), jnp.uint32(0), jnp.uint32(0))
    cap = WAVES * RES * RES
    for b in range(CAPTURE_BOUNCE):
        state, _term = _bounce_step(scene, state, ks, b, capacity=cap,
                                    primary=(b == 0))
    return key_lane, state, int(state[13])


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0])


def main():
    host = load_glb(sponza_like_glb(scale=2))
    scene = build_device_scene(host)
    cam = make_camera(RES, RES, host.camera_position,
                      host.camera_direction, host.camera_focal_length)

    # Every stage returns BOTH its real outputs and a scalar checksum;
    # timing syncs only the checksum (a [8M] device->host pull over the
    # axon tunnel costs ~1 s and would swamp the measurement).
    @jax.jit
    def stage_kernel(scene, o, d, in_q):
        hit = _trace.intersect_scene(scene, o, d, active=in_q)
        return hit, hit.t.sum() + hit.tri.sum()

    @jax.jit
    def stage_shade(scene, hit, d, key, att, rad):
        normal, uv_u, uv_v, mat = _trace.shade_lanes(scene, hit)
        rad_hit = rad + mat.emissive
        d_unit = normalize(d, eps=1e-20)
        cont, new_dir, s_att = mats.scatter(
            scene, mat, d_unit, normal, uv_u, uv_v, key,
            jnp.int32(CAPTURE_BOUNCE + 2))
        out = (cont, new_dir, att * s_att, rad_hit)
        return out, new_dir.x.sum() + rad_hit.y.sum()

    @jax.jit
    def stage_shade_gather(scene, hit):
        normal, uv_u, uv_v, mat = _trace.shade_lanes(scene, hit)
        return ((normal, uv_u, uv_v, mat),
                normal.x.sum() + uv_u.sum() + mat.rough.sum())

    @jax.jit
    def stage_shade_scatter(scene, shx, d, key, att, rad):
        normal, uv_u, uv_v, mat = shx
        rad_hit = rad + mat.emissive
        d_unit = normalize(d, eps=1e-20)
        cont, new_dir, s_att = mats.scatter(
            scene, mat, d_unit, normal, uv_u, uv_v, key,
            jnp.int32(CAPTURE_BOUNCE + 2))
        return ((cont, new_dir, att * s_att, rad_hit),
                new_dir.x.sum() + rad_hit.y.sum())

    @jax.jit
    def stage_key(scene, o, d, tri):
        k = _coherence_key(scene, o, d, hit_tri=tri)
        return k, k.astype(jnp.float32).sum()

    @jax.jit
    def stage_compact(alive, arrays, sort_key, capacity):
        out, cnt = _compact(alive, arrays, capacity, sort_key=sort_key)
        return (out, cnt), out[0].sum() + cnt

    @jax.jit
    def stage_scatter(acc, pix, contrib):
        # production form (wavefront._bounce): 3 separate 1-D adds
        a = jnp.stack([
            acc[:, 0].at[pix].add(contrib[:, 0], mode="drop"),
            acc[:, 1].at[pix].add(contrib[:, 1], mode="drop"),
            acc[:, 2].at[pix].add(contrib[:, 2], mode="drop")], axis=1)
        return a, a.sum()

    stages = {}
    for run in range(RUNS + 1):
        key_lane, state, count = capture_state(scene, cam, seed=10 + run)
        cap = state[0].shape[0]
        (q_ox, q_oy, q_oz, q_dx, q_dy, q_dz,
         q_ar, q_ag, q_ab, q_rr, q_rg, q_rb, q_id, cnt, acc, rays) = state
        in_q = jnp.arange(cap, dtype=jnp.int32) < cnt
        o, d = V3(q_ox, q_oy, q_oz), V3(q_dx, q_dy, q_dz)
        att, rad = V3(q_ar, q_ag, q_ab), V3(q_rr, q_rg, q_rb)
        key = jnp.take(key_lane, q_id, axis=0)
        sync(state)

        def bench(name, fn):
            t0 = time.perf_counter()
            out, chk = fn()
            np.asarray(chk)
            dt = time.perf_counter() - t0
            if run > 0:
                stages.setdefault(name, []).append(dt)
            return out

        hit = bench("kernel", lambda: stage_kernel(scene, o, d, in_q))
        cont, new_dir, new_att, rad_hit = bench(
            "shade", lambda: stage_shade(scene, hit, d, key, att, rad))
        shx = bench("shade/gather", lambda: stage_shade_gather(
            scene, hit))
        bench("shade/scatter", lambda: stage_shade_scatter(
            scene, shx, d, key, att, rad))
        new_o = o + d * hit.t
        sk = bench("key", lambda: stage_key(scene, new_o, new_dir,
                                            hit.tri))
        alive = in_q & (hit.tri >= 0) & cont
        arrays = [new_o.x, new_o.y, new_o.z,
                  new_dir.x, new_dir.y, new_dir.z,
                  new_att.x, new_att.y, new_att.z,
                  rad_hit.x, rad_hit.y, rad_hit.z, q_id]
        bench("compact", lambda: stage_compact(alive, arrays, sk, cap))
        contrib = jnp.stack([att.x, att.y, att.z], axis=1)
        pix = jnp.where(~alive, q_id % acc.shape[0], acc.shape[0])
        bench("scatter", lambda: stage_scatter(acc, pix, contrib))
        # whole real bounce for reference (donates state; rebuild after)
        t0 = time.perf_counter()
        out, _term = _bounce_step(scene, state,
                                  (jnp.uint32(10 + run), jnp.uint32(0),
                                   jnp.uint32(0)),
                                  CAPTURE_BOUNCE, capacity=cap)
        np.asarray(out[13])
        if run > 0:
            stages.setdefault("whole_bounce", []).append(
                time.perf_counter() - t0)
        if run == 0:
            print(f"# queue: {count}/{cap} live at bounce "
                  f"{CAPTURE_BOUNCE}")

    total = np.mean(stages["whole_bounce"])
    for name, ts in stages.items():
        m = np.mean(ts)
        print(f"{name:14s} {m * 1e3:9.1f} ms  ({m / total * 100:5.1f}% "
              f"of whole bounce)")
    live = count
    print(f"# whole-bounce rate: {live / total / 1e6:.2f} Mrays/s "
          f"(live rays)")


if __name__ == "__main__":
    main()
