#!/usr/bin/env python
"""Union-weighted DP collapse A/B (round-5 VERDICT #7).

The collapse DP minimized POINT-ray wide-root area; the measured cost
model is packet-union visits. srt_bvh_build4 dilates every box by the
packet spatial spread s in the objective (Minkowski area a packet of
cross-section s actually sweeps). This probe:

  1. captures the production packet spread (per-packet origin bbox
     extent of dir6_morton-sorted diffuse bounce packets);
  2. A/Bs packet unions (tree_quality walker, kernel traversal order)
     for dilate in {0, s/4, s/2, s, 2s} on sponza_proc primaries +
     bounces.

Go/no-go: union drop >= ~3% at some dilate -> e2e A/B on TPU.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("SRT_PLATFORM", "cpu")

import numpy as np

from tree_quality import P, Tree, sort_key, walk_packet  # noqa: E402
from probe_defer_t import gen_rays  # noqa: E402
from sycl_ray_tracer_tpu.ops import sah  # noqa: E402
from sycl_ray_tracer_tpu.utils.gltf import load_glb  # noqa: E402
from sycl_ray_tracer_tpu.utils import procgen  # noqa: E402


def main():
    n_pk = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    host = load_glb(procgen.sponza_like_glb(scale=2))
    tri = host.tri_v
    print(f"sponza_proc: {tri.shape[0]} tris")
    lo = tri.reshape(-1, 3).min(0)
    hi = tri.reshape(-1, 3).max(0)
    diag = float(np.linalg.norm(hi - lo))
    rs = np.random.RandomState(7)
    n = n_pk * P
    o, d = gen_rays(host, rs, n)

    # one baseline walk to generate bounce rays
    b0 = sah.build_sah(tri, 8)
    tr0 = Tree(tri, b0)
    hit_t = np.empty(n, np.float32)
    hit_id = np.empty(n, np.int64)
    for pk in range(n_pk):
        s = slice(pk * P, (pk + 1) * P)
        _, _, tt, hh = walk_packet(tr0, o[s], d[s])
        hit_t[s] = tt
        hit_id[s] = hh
    ok = hit_id >= 0
    hp = o[ok] + d[ok] * hit_t[ok, None]
    tv = tri[hit_id[ok]]
    nrm = np.cross(tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0])
    nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True),
                      1e-12)
    nrm *= -np.sign((nrm * d[ok]).sum(1, keepdims=True))
    rnd = rs.normal(size=(int(ok.sum()), 3)).astype(np.float32)
    rnd /= np.linalg.norm(rnd, axis=1, keepdims=True)
    bd = nrm + rnd
    bd /= np.maximum(np.linalg.norm(bd, axis=1, keepdims=True), 1e-9)
    bo = (hp + nrm * 1e-3).astype(np.float32)
    bd = bd.astype(np.float32)
    key = sort_key(bo, bd, lo, hi)
    srt = np.argsort(key, kind="stable")
    bo, bd = bo[srt], bd[srt]
    nb = bo.shape[0] // P

    # measured packet spread: median per-packet origin bbox extent
    spreads = []
    for pk in range(nb):
        s = slice(pk * P, (pk + 1) * P)
        ext = bo[s].max(0) - bo[s].min(0)
        spreads.append(np.linalg.norm(ext))
    s_med = float(np.median(spreads))
    print(f"bounce-packet origin spread: median {s_med:.3f} "
          f"(= {s_med/diag*100:.1f}% of scene diag {diag:.1f}); "
          f"p25 {np.percentile(spreads, 25):.3f} "
          f"p75 {np.percentile(spreads, 75):.3f}")

    for frac, s_d in [("0", 0.0), ("s/4", s_med / 4),
                      ("s/2", s_med / 2), ("s", s_med),
                      ("2s", 2 * s_med)]:
        t0 = time.time()
        b = (b0 if s_d == 0.0
             else sah.build_sah(tri, 8, dilate=float(s_d)))
        tr = Tree(tri, b)
        pv = pd_ = 0
        for pk in range(n_pk):
            sl = slice(pk * P, (pk + 1) * P)
            v_, d_, _, _ = walk_packet(tr, o[sl], d[sl])
            pv += v_
            pd_ += d_
        bv = bd_ = 0
        for pk in range(nb):
            sl = slice(pk * P, (pk + 1) * P)
            v_, d_, _, _ = walk_packet(tr, bo[sl], bd[sl])
            bv += v_
            bd_ += d_
        print(f"dilate={frac:4s} ({s_d:7.3f}): ni={b.num_internal} "
              f"prim U {pv/n_pk:6.1f}+{pd_/n_pk:6.1f}  "
              f"bounce U {bv/nb:6.1f}+{bd_/nb:6.1f}  "
              f"[{time.time()-t0:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
