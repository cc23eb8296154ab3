#!/usr/bin/env python
"""Probe: what fraction of v5 leaf drains are WASTED (go/no-go for a
drain-time leaf-skip, PLAN_TPU round-3)?

The leaf MT block is ~80% of the kernel's vector issue (8-tri x rb-row
MT per drain vs 1 slab batch per internal pop), so skipping drains that
cannot improve any lane is the last per-visit op-count lever. The skip
test (per-lane slab vs the leaf bbox against CURRENT t) can only run
under scalar control flow, i.e. it must ride the iteration readback.
This probe instruments the production kernel (traverse_packets5
stats=True) to count, on REAL captured bounce queues:

  drains     leaf visits executed
  noimp      drains where no lane improved t (upper bound on waste)
  slabfail   drains a per-lane slab re-test vs current t would skip
             (the exact condition the optimization could use; computed
             against pre-MT t of the same iteration, so it is the
             OPTIMISTIC same-iteration variant — a pipelined
             one-iteration-stale test skips somewhat fewer)

Decision rule (PLAN_TPU): the skip saves ~280 vector ops/drain but
costs ~100 for the slab precompute on every drain -> net win needs
slabfail/drains > ~0.35 (shared-sync pipelined form).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))

os.environ.setdefault("BB_WAVES", "4")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bounce_breakdown import RES, capture_state  # noqa: E402
from sycl_ray_tracer_tpu.models.camera import make_camera  # noqa: E402
from sycl_ray_tracer_tpu.models.scene import build_device_scene  # noqa: E402
from sycl_ray_tracer_tpu.models.trace import V5_BOUNCE, V5_PRIMARY  # noqa: E402
from sycl_ray_tracer_tpu.ops.traverse_pallas5 import traverse_packets5  # noqa: E402
from sycl_ray_tracer_tpu.ops.vec import V3  # noqa: E402
from sycl_ray_tracer_tpu.utils.gltf import load_glb  # noqa: E402
from sycl_ray_tracer_tpu.utils.procgen import sponza_like_glb  # noqa: E402


def main():
    host = load_glb(sponza_like_glb(scale=2))
    scene = build_device_scene(host)
    cam = make_camera(RES, RES, host.camera_position,
                      host.camera_direction, host.camera_focal_length)
    ni = scene.sah_ni if scene.has_sah else scene.bvh_ni

    # real sorted bounce queue (bounce_breakdown methodology)
    key_lane, state, count = capture_state(scene, cam, seed=11)
    n = 1 << 20
    o = V3(state[0][:n], state[1][:n], state[2][:n])
    d = V3(state[3][:n], state[4][:n], state[5][:n])
    act = jnp.arange(n, dtype=jnp.int32) < min(count, n)
    print(f"# captured queue: {count} live; probing first {n} rays",
          flush=True)

    for name, (rb, ki, ml), oo, dd, aa in (
            ("bounce", V5_BOUNCE, o, d, act),):
        hit, st = traverse_packets5(
            scene.bvh_ctiles, scene.bvh_ltiles, ni, scene.leaf_size,
            oo, dd, active=aa, rows=rb, ki=ki, ml=ml, stats=True)
        # cross-check: stats kernel returns the same hits
        hit0 = traverse_packets5(
            scene.bvh_ctiles, scene.bvh_ltiles, ni, scene.leaf_size,
            oo, dd, active=aa, rows=rb, ki=ki, ml=ml)
        same = bool(jnp.array_equal(hit.tri, hit0.tri)
                    & jnp.allclose(hit.t, hit0.t))
        s = np.asarray(st)       # [G, 8, 128]; lane 0 of rows 0..2
        drains = float(s[:, 0, 0].sum())
        noimp = float(s[:, 1, 0].sum())
        slabf = float(s[:, 2, 0].sum())
        print(f"{name} rb{rb}-k{ki}-m{ml}: drains {drains:.0f} "
              f"({drains / (n / (128 * max(rb, 8))):.0f}/packet), "
              f"noimp {noimp / max(drains, 1) * 100:.1f}%, "
              f"slabfail {slabf / max(drains, 1) * 100:.1f}%  "
              f"hits-match={same}", flush=True)

    # primaries for contrast
    from sycl_ray_tracer_tpu.models.wavefront import _gen_queue
    _, st0 = _gen_queue(scene, cam, 11, 0, width=RES, height=RES,
                        waves=1)
    op = V3(st0[0][:n], st0[1][:n], st0[2][:n])
    dp = V3(st0[3][:n], st0[4][:n], st0[5][:n])
    rb, ki, ml = V5_BOUNCE
    hit, st = traverse_packets5(
        scene.bvh_ctiles, scene.bvh_ltiles, ni, scene.leaf_size,
        op, dp, rows=rb, ki=ki, ml=ml, stats=True)
    s = np.asarray(st)
    drains = float(s[:, 0, 0].sum())
    noimp = float(s[:, 1, 0].sum())
    slabf = float(s[:, 2, 0].sum())
    print(f"primary rb{rb}-k{ki}-m{ml}: drains {drains:.0f}, "
          f"noimp {noimp / max(drains, 1) * 100:.1f}%, "
          f"slabfail {slabf / max(drains, 1) * 100:.1f}%", flush=True)


if __name__ == "__main__":
    main()
