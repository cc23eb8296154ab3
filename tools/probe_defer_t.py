#!/usr/bin/env python
"""U-growth from deferred leaf drains (round-5 VERDICT #1, part 2).

The batched-MXU drain (tools/probe_mxu_batch.py: ~85-100 cyc/leaf
visit vs the VPU MT block's ~236 at batch 8) defers leaf intersection
until 8 leaves are pending, so internal slab tests prune against a
STALE t between batches. This walker mirrors the kernel's traversal
order (near-first pops, t-pruned pushes) in two modes:

  immediate  leaves drain the moment they are discovered (the
             sequential-t upper bound on pruning; v5's ring lags by
             <= ml-1 leaves, between the two modes)
  defer8     leaves queue FIFO; every 8 pending, one batch drains
             with t updated only AT the batch boundary (v8 semantics)

Reports visits/drains per packet for primaries and sorted diffuse
bounces, and the modeled cycle ratio with the measured per-visit
costs. Hits must be IDENTICAL between modes (deferral cannot change
the final closest hit, only the visit count) — asserted.

Usage: python tools/probe_defer_t.py [scene] [n_packets]
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

from tree_quality import P, Tree, _INF, morton3, sort_key  # noqa: E402
from sycl_ray_tracer_tpu.ops import sah  # noqa: E402
from sycl_ray_tracer_tpu.utils.gltf import load_glb  # noqa: E402
from sycl_ray_tracer_tpu.utils import procgen  # noqa: E402


def drain_leaf(tr, leaf, o, d, t, hit):
    n = o.shape[0]
    v0, e1, e2 = tr.v0[leaf], tr.e1[leaf], tr.e2[leaf]
    pv = np.cross(d[:, None, :], e2.T[None], axis=2)
    det = (pv * e1.T[None]).sum(2)
    inv = np.where(np.abs(det) > 1e-12, 1.0 / det, 0.0)
    tv = o[:, None, :] - v0.T[None]
    u = (tv * pv).sum(2) * inv
    qv = np.cross(tv, e1.T[None], axis=2)
    v = (qv * d[:, None, :]).sum(2) * inv
    tt = (qv * e2.T[None]).sum(2) * inv
    good = ((np.abs(det) > 1e-12) & (u >= 0) & (v >= 0)
            & (u + v <= 1) & (tt > 1e-4) & ~tr.pad[leaf][None])
    tt = np.where(good, tt, np.inf).astype(np.float32)
    j = tt.argmin(1)
    tb = tt[np.arange(n), j]
    upd = tb < t
    t = np.where(upd, tb, t)
    hit = np.where(upd, tr.order[leaf * tr.k + j], hit)
    return t, hit


def walk_packet_defer(tr, o, d, batch=8):
    """Kernel-order walk with FIFO leaf deferral: drains happen only
    when `batch` leaves are pending (or the stack empties), and each
    batch tests against the t of its OWN start (matching the batched
    epilogue's shared stale tb), with t updated at the boundary."""
    n = o.shape[0]
    invd = np.where(np.abs(d) > 1e-12, 1.0 / d, np.float32(1e12))
    t = np.full(n, np.inf, np.float32)
    hit = np.full(n, -1, np.int64)
    stack = [(0, 0.0)]
    pending = []
    visits = drains = batches = 0

    def flush(t, hit):
        nonlocal drains, batches
        # batch semantics: every leaf in the batch tests vs the same
        # stale t; winner = global min — identical final hits to
        # sequential order (min is order-free)
        batches += 1
        for leaf in pending:
            drains += 1
            t, hit = drain_leaf(tr, leaf, o, d, t, hit)
        pending.clear()
        return t, hit

    while stack or pending:
        if len(pending) >= batch or (not stack and pending):
            t, hit = flush(t, hit)
            continue
        node, _ = stack.pop()
        if node >= tr.ni:
            pending.append(node - tr.ni)
            continue
        visits += 1
        b = tr.boxes[node]
        t0 = (b[0:3][None] - o[:, :, None]) * invd[:, :, None]
        t1 = (b[3:6][None] - o[:, :, None]) * invd[:, :, None]
        near = np.minimum(t0, t1).max(1)
        far = np.maximum(t0, t1).min(1)
        ok = (near <= far) & (far >= 0) & (near < t[:, None])
        anyhit = ok.any(0)
        mean_near = np.where(ok, near, np.inf).min(0)
        for j in np.argsort(-mean_near):
            if anyhit[j] and tr.boxes[node, 0, j] < _INF:
                stack.append((int(tr.ids[node, j]),
                              float(mean_near[j])))
    return visits, drains, batches, t, hit


def walk_packet_imm(tr, o, d):
    """Immediate variant through the same leaf queue plumbing
    (batch=1), so the only difference measured is the deferral."""
    return walk_packet_defer(tr, o, d, batch=1)


def gen_rays(host, rs, n):
    tri = host.tri_v
    res = 1024
    cp = np.asarray(host.camera_position, np.float32)
    cd = np.asarray(host.camera_direction, np.float32)
    cd = cd / np.linalg.norm(cd)
    up = np.array([0, 1, 0], np.float32)
    right = np.cross(cd, up)
    right /= np.linalg.norm(right)
    vup = np.cross(right, cd)
    fl = float(host.camera_focal_length or 1.0)
    pix = rs.randint(0, res, (n, 2))
    px = (pix[:, 0] + 0.5) / res - 0.5
    py = (pix[:, 1] + 0.5) / res - 0.5
    d = (cd[None] * fl + right[None] * px[:, None]
         + vup[None] * py[:, None]).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = np.broadcast_to(cp, (n, 3)).astype(np.float32).copy()
    q = np.clip(pix * (1024 // res), 0, 1023).astype(np.uint64)
    key = morton3(q[:, 0], q[:, 1], np.zeros(n, np.uint64))
    srt = np.argsort(key, kind="stable")
    return o[srt], d[srt]


def main():
    scene = sys.argv[1] if len(sys.argv) > 1 else "sponza_proc"
    n_pk = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    glb = (procgen.sponza_like_glb(scale=2) if scene == "sponza_proc"
           else procgen.minecraft_like_glb())
    host = load_glb(glb)
    tri = host.tri_v
    print(f"{scene}: {tri.shape[0]} tris")
    lo = tri.reshape(-1, 3).min(0)
    hi = tri.reshape(-1, 3).max(0)
    rs = np.random.RandomState(7)
    n = n_pk * P
    o, d = gen_rays(host, rs, n)

    b = sah.build_sah(tri, 8, spatial=False)
    tr = Tree(tri, b)

    t0 = time.time()
    stats = {}
    hits = {}
    for name, fn in (("immediate", walk_packet_imm),
                     ("defer8", walk_packet_defer)):
        vis = dra = bat = 0
        hit_t = np.empty(n, np.float32)
        hit_id = np.empty(n, np.int64)
        for pk in range(n_pk):
            s = slice(pk * P, (pk + 1) * P)
            v_, d_, b_, tt, hh = fn(tr, o[s], d[s])
            vis += v_
            dra += d_
            bat += b_
            hit_t[s] = tt
            hit_id[s] = hh
        stats[("prim", name)] = (vis / n_pk, dra / n_pk, bat / n_pk)
        hits[name] = (hit_t.copy(), hit_id.copy())
        print(f"primary {name:9s}: {vis/n_pk:7.1f} visits "
              f"{dra/n_pk:6.1f} drains {bat/n_pk:5.1f} batches /packet")
    assert np.array_equal(hits["immediate"][1], hits["defer8"][1]), \
        "deferral changed hit ids!"
    assert np.allclose(hits["immediate"][0], hits["defer8"][0]), \
        "deferral changed hit t!"
    print("primary hits identical across modes (asserted)")

    # diffuse bounces from primary hits, production-sorted
    hit_t, hit_id = hits["immediate"]
    ok = hit_id >= 0
    hp = o[ok] + d[ok] * hit_t[ok, None]
    tv = tri[hit_id[ok]]
    nrm = np.cross(tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0])
    nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-12)
    nrm *= -np.sign((nrm * d[ok]).sum(1, keepdims=True))
    rnd = rs.normal(size=(int(ok.sum()), 3)).astype(np.float32)
    rnd /= np.linalg.norm(rnd, axis=1, keepdims=True)
    bd = nrm + rnd
    bd /= np.maximum(np.linalg.norm(bd, axis=1, keepdims=True), 1e-9)
    bo = (hp + nrm * 1e-3).astype(np.float32)
    bd = bd.astype(np.float32)
    key = sort_key(bo, bd, lo, hi)
    srt2 = np.argsort(key, kind="stable")
    bo, bd = bo[srt2], bd[srt2]
    nb = bo.shape[0] // P
    bh = {}
    for name, fn in (("immediate", walk_packet_imm),
                     ("defer8", walk_packet_defer)):
        vis = dra = bat = 0
        ts, ids = [], []
        for pk in range(nb):
            s = slice(pk * P, (pk + 1) * P)
            v_, d_, b_, tt, hh = fn(tr, bo[s], bd[s])
            vis += v_
            dra += d_
            bat += b_
            ts.append(tt)
            ids.append(hh)
        stats[("bounce", name)] = (vis / nb, dra / nb, bat / nb)
        bh[name] = (np.concatenate(ts), np.concatenate(ids))
        print(f"bounce  {name:9s}: {vis/nb:7.1f} visits "
              f"{dra/nb:6.1f} drains {bat/nb:5.1f} batches /packet")
    assert np.array_equal(bh["immediate"][1], bh["defer8"][1])
    print(f"bounce hits identical across modes (asserted) "
          f"[{time.time()-t0:.0f}s]")

    # modeled cycle ratio: internal visit ~205 cyc (450 total - 244 MT
    # block, round-4 attribution), drain = 244 (VPU MT) vs ~90+pad
    # (batched MXU incl. partial-batch padding via batches x fixed)
    for phase in ("prim", "bounce"):
        vi, di, _ = stats[(phase, "immediate")]
        vd, dd, bb = stats[(phase, "defer8")]
        c_int, c_mt = 205.0, 244.0
        base = vi * c_int + di * c_mt
        # batched drain: ~200 cyc fixed per batch + ~55/leaf marginal
        # (mmb curve); epilogue rides inside the measured 85-100
        mxu = vd * c_int + bb * 200.0 + dd * 55.0
        print(f"{phase}: visits {vi:.0f}->{vd:.0f} "
              f"({(vd/vi-1)*100:+.1f}%), modeled kernel cycles "
              f"{base:.0f}->{mxu:.0f} ({(1-mxu/base)*100:+.1f}% less)")


if __name__ == "__main__":
    main()
