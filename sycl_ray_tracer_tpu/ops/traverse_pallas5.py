"""Pallas packet traversal v5: sync-amortized multi-visit iterations.

The decisive measurement (tools/probe_visit_cost.py, with the fixed
timing methodology — np.asarray sync, verified trip counts): a
traversal-shaped Mosaic loop costs per iteration
    ~147 cyc  vector->scalar readback (pipeline-drain sync)
    ~ 63 cyc  128-lane min-reduce
    ~130 cyc  tile load + gathers + vector math (latency chain)
    ~  2 cyc  loop/stack machinery
The readback sync is paid once per VISIT in v1-v4. v5 restructures so
one iteration retires K internal nodes + M leaves around a SINGLE
readback:

- K internal nodes are popped together; their K slab batches are
  independent (they read the same carried t_best registers), so their
  load/gather/math chains pipeline. Their K key/id columns merge into
  ONE keybuf/idbuf store -> ONE sync -> 16K cheap scalar reads.
- Leaves live in a separate SMEM ring (discovered at push time by
  id >= ni); M of them are processed in the same iteration. Leaf
  visits need NO readback at all — their MT math chains fill the
  latency shadow of the internal phase.
- Ray state stays in while-carry REGISTERS (v2 style). A discarded
  round-2 variant ("v4") kept it in output refs and the ref aliasing
  between streams serialized everything — carries leave the
  scheduler free to interleave.
- Pushes are branch-free: every child writes unconditionally, with
  non-hits going to a trash slot (no pl.when in the visit loop).

Ordering: children of each node still push far-to-near by packet-min
slab distance; across the K nodes, the nearer-popped node's children
land higher. Leaves test in ring (FIFO) order — exact closest-hit
result, slightly different tie-breaks and t_best evolution than v2.

Fill-the-role citation as v1-v4: the reference's rtcIntersect1
(trace_ray.hpp:22).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sycl_ray_tracer_tpu.ops.intersect import BIG, TNEAR, Hit, _DET_EPS
from sycl_ray_tracer_tpu.ops.vec import V3

PACKET_ROWS5 = int(os.environ.get("SRT_PACKET_ROWS5", "8"))
KI = int(os.environ.get("SRT_V5_KI", "2"))   # internal nodes / iter
ML = int(os.environ.get("SRT_V5_ML", "2"))   # leaves / iter
_STACK = 256
_LQ = 4096
_MISS = np.float32(BIG) * np.float32(0.5)


def _bcast_gather(tile, lane, n=8):
    idx = jnp.full((n, 128), lane, jnp.int32)
    return jnp.take_along_axis(tile, idx, axis=1)


def _traverse_subpacket5(ctiles_ref, ltiles_ref,
                         ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                         act_ref, t0_ref,
                         t_ref, tri_ref, u_ref, v_ref,
                         stack_ref, lq_ref, keybuf_ref, idbuf_ref,
                         *, ni: int, k: int, rb: int, ki: int, ml: int,
                         row0: int, cfmt: str = "f32",
                         stats_ref=None, ldesc_ref=None):
    rows = [row0 + r for r in range(rb)]
    ox = [ox_ref[r:r + 1, :] for r in rows]
    oy = [oy_ref[r:r + 1, :] for r in rows]
    oz = [oz_ref[r:r + 1, :] for r in rows]
    dx = [dx_ref[r:r + 1, :] for r in rows]
    dy = [dy_ref[r:r + 1, :] for r in rows]
    dz = [dz_ref[r:r + 1, :] for r in rows]
    act = [act_ref[r:r + 1, :] != 0 for r in rows]
    inv = lambda a: jnp.where(jnp.abs(a) > 1e-20, 1.0 / a,
                              jnp.float32(1e20))
    ix = [inv(a) for a in dx]
    iy = [inv(a) for a in dy]
    iz = [inv(a) for a in dz]

    # t_best starts from t0 (BIG for a standalone traversal; a prior
    # treelet pass's result when chaining — ops/treelets.py): only
    # strictly closer hits are reported, so tri stays -1 when the
    # incumbent survives. Inactive lanes get -BIG (can never pass).
    t0 = [jnp.where(a, t0_ref[r:r + 1, :], jnp.float32(-BIG))
          for r, a in zip(rows, act)]
    tm1 = [jnp.full((1, 128), -1, jnp.int32) for _ in range(rb)]
    zz = [jnp.zeros((1, 128), jnp.float32) for _ in range(rb)]

    stack_ref[0] = 0
    jrow = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    fni = jnp.float32(ni)

    # carry: (sp, lhead, ltail, t(rb), tri(rb), u(rb), v(rb)
    #         [, 3 stats counters])
    zc = jnp.zeros((1, 128), jnp.float32)
    carry0 = (jnp.int32(1), jnp.int32(0), jnp.int32(0),
              tuple(t0), tuple(tm1), tuple(zz), tuple(zz))
    if stats_ref is not None:
        carry0 = carry0 + ((zc, zc, zc),)

    def cond(c):
        return (c[0] > 0) | (c[2] > c[1])

    def body(c):
        sp, lh, lt, t_best, tri_best, ub, vb = c[:7]
        cnts = c[7] if stats_ref is not None else None

        # ---- pop K internal nodes (gated) ----
        # Ring-occupancy guard (round-2 advisor finding): each pop can
        # push up to 8 leaves but only ml drain per iteration, so a
        # backlog could wrap the SMEM ring and silently overwrite
        # unprocessed leaf ids. Gate pops into drain-only iterations
        # whenever the pending count could overflow the ring.
        room = (lt - lh) < (_LQ - 8 * ki)
        have_i = [((sp > kk) & room).astype(jnp.int32)
                  for kk in range(ki)]
        nds = [stack_ref[jnp.maximum(sp - 1 - kk, 0)]
               for kk in range(ki)]
        n_pop = have_i[0]
        for kk in range(1, ki):
            n_pop = n_pop + have_i[kk]
        sp = sp - n_pop

        # ---- K slab batches -> merged key/id columns ----
        kcomb = jnp.full((8, 128), jnp.float32(BIG))
        icomb = jnp.zeros((8, 128), jnp.float32)
        for kk in range(ki):
            nd = jnp.minimum(nds[kk], ni - 1)
            if cfmt == "bf16p":
                # packed tile: 4 lanes/node — (lo,hi) per axis as two
                # bf16 in one f32 word (bf16 bits = top 16 of f32), id.
                # Unpacking is pure integer ops on (8,128) registers —
                # they fill the gather latency shadow. 3 fewer
                # broadcast-gathers per visit + half the VMEM.
                tile = ctiles_ref[nd // 32]
                base = 4 * (nd % 32)

                def unpk(p):
                    w = jax.lax.bitcast_convert_type(p, jnp.uint32)
                    lo = jax.lax.bitcast_convert_type(
                        w << 16, jnp.float32)
                    hi = jax.lax.bitcast_convert_type(
                        w & jnp.uint32(0xFFFF0000), jnp.float32)
                    return lo, hi

                lox, hix = unpk(_bcast_gather(tile, base + 0))
                loy, hiy = unpk(_bcast_gather(tile, base + 1))
                loz, hiz = unpk(_bcast_gather(tile, base + 2))
                idlane = base + 3
            else:
                tile = ctiles_ref[nd // 16]
                base = 8 * (nd % 16)
                lox = _bcast_gather(tile, base + 0)
                loy = _bcast_gather(tile, base + 1)
                loz = _bcast_gather(tile, base + 2)
                hix = _bcast_gather(tile, base + 3)
                hiy = _bcast_gather(tile, base + 4)
                hiz = _bcast_gather(tile, base + 5)
                idlane = base + 6
            key_acc = jnp.full((8, 128), jnp.float32(BIG))
            for i in range(rb):
                t1x = (lox - ox[i]) * ix[i]
                t2x = (hix - ox[i]) * ix[i]
                t1y = (loy - oy[i]) * iy[i]
                t2y = (hiy - oy[i]) * iy[i]
                t1z = (loz - oz[i]) * iz[i]
                t2z = (hiz - oz[i]) * iz[i]
                tmin = jnp.maximum(
                    jnp.maximum(jnp.minimum(t1x, t2x),
                                jnp.minimum(t1y, t2y)),
                    jnp.minimum(t1z, t2z))
                tmax = jnp.minimum(
                    jnp.minimum(jnp.maximum(t1x, t2x),
                                jnp.maximum(t1y, t2y)),
                    jnp.maximum(t1z, t2z))
                hit = ((tmax >= jnp.maximum(tmin, TNEAR))
                       & (tmin < t_best[i]))
                key_acc = jnp.minimum(
                    key_acc, jnp.where(hit, tmin, jnp.float32(BIG)))
            key = jnp.min(key_acc, axis=1, keepdims=True)    # (8,1)
            kcomb = jnp.where(lane_i == kk,
                              jnp.broadcast_to(key, (8, 128)), kcomb)
            icomb = jnp.where(lane_i == kk,
                              _bcast_gather(tile, idlane), icomb)

        # ---- M leaf visits from the ring (no readback needed) ----
        t_new = list(t_best)
        tri_new = list(tri_best)
        u_new = list(ub)
        v_new = list(vb)
        lh0 = lh
        for mm in range(ml):
            have_l = ((lt - lh0) > mm)
            lf = lq_ref[(lh0 + mm) % _LQ]
            lfc = jnp.maximum(lf - ni, 0)
            if ldesc_ref is not None:
                # instanced drain (models/instanced.py): the global
                # leaf's descriptor row gives the SHARED leaf tile
                # slot + the 12-float world->local transform; rays
                # are transformed into instance space below (d left
                # unnormalized, so t stays world-valid)
                lrow = jnp.minimum(lfc, ldesc_ref.shape[0] - 1)
                slot = ldesc_ref[lrow, 0].astype(jnp.int32)
                ltile = ltiles_ref[jnp.minimum(
                    slot // 8, ltiles_ref.shape[0] - 1)]
                lbase = 16 * (slot % 8)
                im = [ldesc_ref[lrow, 2 + c] for c in range(12)]
            else:
                ltile = ltiles_ref[jnp.minimum(
                    lfc // 8, ltiles_ref.shape[0] - 1)]
                lbase = 16 * (lfc % 8)
            v0x = _bcast_gather(ltile, lbase + 0)
            v0y = _bcast_gather(ltile, lbase + 1)
            v0z = _bcast_gather(ltile, lbase + 2)
            e1x = _bcast_gather(ltile, lbase + 3)
            e1y = _bcast_gather(ltile, lbase + 4)
            e1z = _bcast_gather(ltile, lbase + 5)
            e2x = _bcast_gather(ltile, lbase + 6)
            e2y = _bcast_gather(ltile, lbase + 7)
            e2z = _bcast_gather(ltile, lbase + 8)
            if stats_ref is not None:
                # measurement only: would a drain-time per-lane slab
                # test against the CURRENT t_best have skipped this
                # leaf's whole MT block? Leaf bbox is derived from its
                # 8 triangles (v0, v0+e1, v0+e2 per axis).
                drain_f = have_l.astype(jnp.float32)
                pass_any = jnp.zeros((1, 128), jnp.float32)
                imp_any = jnp.zeros((1, 128), jnp.float32)
                ext = []
                for vv0, ee1, ee2 in ((v0x, e1x, e2x),
                                      (v0y, e1y, e2y),
                                      (v0z, e1z, e2z)):
                    pts_lo = jnp.minimum(jnp.minimum(vv0, vv0 + ee1),
                                         vv0 + ee2)
                    pts_hi = jnp.maximum(jnp.maximum(vv0, vv0 + ee1),
                                         vv0 + ee2)
                    ext.append((jnp.min(pts_lo, axis=0, keepdims=True),
                                jnp.max(pts_hi, axis=0, keepdims=True)))
                for i in range(rb):
                    (lox, hix), (loy, hiy), (loz, hiz) = ext
                    t1x = (lox - ox[i]) * ix[i]
                    t2x = (hix - ox[i]) * ix[i]
                    t1y = (loy - oy[i]) * iy[i]
                    t2y = (hiy - oy[i]) * iy[i]
                    t1z = (loz - oz[i]) * iz[i]
                    t2z = (hiz - oz[i]) * iz[i]
                    tmn = jnp.maximum(
                        jnp.maximum(jnp.minimum(t1x, t2x),
                                    jnp.minimum(t1y, t2y)),
                        jnp.minimum(t1z, t2z))
                    tmx = jnp.minimum(
                        jnp.minimum(jnp.maximum(t1x, t2x),
                                    jnp.maximum(t1y, t2y)),
                        jnp.maximum(t1z, t2z))
                    p = ((tmx >= jnp.maximum(tmn, TNEAR))
                         & (tmn < t_new[i]))
                    pass_any = jnp.maximum(
                        pass_any,
                        jnp.max(p.astype(jnp.float32), axis=1,
                                keepdims=True))
            for i in range(rb):
                if ldesc_ref is not None:
                    oxi = im[0] * ox[i] + im[1] * oy[i] \
                        + im[2] * oz[i] + im[9]
                    oyi = im[3] * ox[i] + im[4] * oy[i] \
                        + im[5] * oz[i] + im[10]
                    ozi = im[6] * ox[i] + im[7] * oy[i] \
                        + im[8] * oz[i] + im[11]
                    dxi = im[0] * dx[i] + im[1] * dy[i] \
                        + im[2] * dz[i]
                    dyi = im[3] * dx[i] + im[4] * dy[i] \
                        + im[5] * dz[i]
                    dzi = im[6] * dx[i] + im[7] * dy[i] \
                        + im[8] * dz[i]
                else:
                    oxi, oyi, ozi = ox[i], oy[i], oz[i]
                    dxi, dyi, dzi = dx[i], dy[i], dz[i]
                px = dyi * e2z - dzi * e2y
                py = dzi * e2x - dxi * e2z
                pz = dxi * e2y - dyi * e2x
                det = e1x * px + e1y * py + e1z * pz
                inv_det = jnp.where(jnp.abs(det) > _DET_EPS,
                                    1.0 / det, 0.0)
                tx = oxi - v0x
                ty = oyi - v0y
                tz = ozi - v0z
                uu = (tx * px + ty * py + tz * pz) * inv_det
                qx = ty * e1z - tz * e1y
                qy = tz * e1x - tx * e1z
                qz = tx * e1y - ty * e1x
                vv = (dxi * qx + dyi * qy + dzi * qz) * inv_det
                tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                ok = ((jnp.abs(det) > _DET_EPS)
                      & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                      & (tt > TNEAR) & (tt < t_new[i]))
                ttm = jnp.where(ok, tt, jnp.float32(BIG))
                best = jnp.min(ttm, axis=0, keepdims=True)
                has = (best < _MISS) & have_l
                jbest = jnp.min(jnp.where(ttm <= best, jrow, 8),
                                axis=0, keepdims=True)
                one_hot = jrow == jbest
                usel = jnp.sum(jnp.where(one_hot, uu, 0.0),
                               axis=0, keepdims=True)
                vsel = jnp.sum(jnp.where(one_hot, vv, 0.0),
                               axis=0, keepdims=True)
                t_new[i] = jnp.where(has, best, t_new[i])
                tri_new[i] = jnp.where(has, lfc * k + jbest,
                                       tri_new[i])
                u_new[i] = jnp.where(has, usel, u_new[i])
                v_new[i] = jnp.where(has, vsel, v_new[i])
                if stats_ref is not None:
                    imp_any = jnp.maximum(
                        imp_any,
                        jnp.max(has.astype(jnp.float32), axis=1,
                                keepdims=True))
            if stats_ref is not None:
                cd, cn, cs = cnts
                cnts = (cd + drain_f,
                        cn + drain_f * (1.0 - imp_any),
                        cs + drain_f * (1.0 - pass_any))
        lh = lh0 + jnp.minimum(lt - lh0, ml)

        # ---- ONE readback sync for all K nodes ----
        keybuf_ref[:] = kcomb
        idbuf_ref[:] = icomb

        # push nearer-popped nodes' children LAST (on top)
        for kk in reversed(range(ki)):
            keys = [keybuf_ref[j, kk] for j in range(8)]
            ids = [idbuf_ref[j, kk] for j in range(8)]
            isl = [(ids[j] >= fni).astype(jnp.int32) for j in range(8)]
            hits = [((keys[j] < _MISS).astype(jnp.int32)
                     * have_i[kk]) for j in range(8)]
            ihit = [hits[j] * (1 - isl[j]) for j in range(8)]
            lhit = [hits[j] * isl[j] for j in range(8)]
            n_int = ihit[0]
            for j in range(1, 8):
                n_int = n_int + ihit[j]
            for j in range(8):
                ahead = jnp.int32(0)
                for j2 in range(8):
                    if j2 == j:
                        continue
                    farther = (keys[j2] > keys[j]) if j2 < j else (
                        keys[j2] >= keys[j])
                    ahead = ahead + ihit[j2] * farther.astype(jnp.int32)
                # trash slot _STACK sits OUTSIDE the usable range (the
                # scratch is _STACK+1 deep), so a legitimately full
                # stack can't be clobbered by non-hit trash writes
                slot = jnp.where(ihit[j] == 1, sp + ahead, _STACK)
                stack_ref[slot] = ids[j].astype(jnp.int32)
            sp = sp + n_int
            lcnt = jnp.int32(0)
            for j in range(8):
                slot = jnp.where(lhit[j] == 1, (lt + lcnt) % _LQ, _LQ)
                lq_ref[slot] = ids[j].astype(jnp.int32)
                lcnt = lcnt + lhit[j]
            lt = lt + lcnt

        out = (sp, lh, lt, tuple(t_new), tuple(tri_new),
               tuple(u_new), tuple(v_new))
        if stats_ref is not None:
            out = out + (cnts,)
        return out

    fin = jax.lax.while_loop(cond, body, carry0)
    t_best, tri_best, ub, vb = fin[3:7]

    for i, r in enumerate(rows):
        t_ref[r:r + 1, :] = jnp.where(act[i], t_best[i], 0.0)
        tri_ref[r:r + 1, :] = jnp.where(act[i], tri_best[i], -1)
        u_ref[r:r + 1, :] = ub[i]
        v_ref[r:r + 1, :] = vb[i]
    if stats_ref is not None:
        cd, cn, cs = fin[7]
        if row0 == 0:   # first subpacket of the block initializes
            stats_ref[0:1, :] = cd
            stats_ref[1:2, :] = cn
            stats_ref[2:3, :] = cs
            stats_ref[3:8, :] = jnp.zeros((5, 128), jnp.float32)
        else:
            stats_ref[0:1, :] = stats_ref[0:1, :] + cd
            stats_ref[1:2, :] = stats_ref[1:2, :] + cn
            stats_ref[2:3, :] = stats_ref[2:3, :] + cs


def _packet_kernel5(ctiles_ref, ltiles_ref,
                    *refs, ni: int, k: int, rb: int, ki: int, ml: int,
                    cfmt: str = "f32", stats: bool = False,
                    itf: bool = False):
    ldesc_ref = None
    if itf:
        ldesc_ref, refs = refs[0], refs[1:]
    (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
     act_ref, t0_ref, t_ref, tri_ref, u_ref, v_ref) = refs[:12]
    refs = refs[12:]
    if stats:
        (stats_ref, stack_ref, lq_ref,
         keybuf_ref, idbuf_ref) = refs
    else:
        stats_ref = None
        stack_ref, lq_ref, keybuf_ref, idbuf_ref = refs
    for s in range(max(rb, 8) // rb):
        _traverse_subpacket5(
            ctiles_ref, ltiles_ref, ox_ref, oy_ref, oz_ref,
            dx_ref, dy_ref, dz_ref, act_ref, t0_ref,
            t_ref, tri_ref, u_ref, v_ref,
            stack_ref, lq_ref, keybuf_ref, idbuf_ref,
            ni=ni, k=k, rb=rb, ki=ki, ml=ml, row0=s * rb,
            cfmt=cfmt, stats_ref=stats_ref, ldesc_ref=ldesc_ref)


@functools.partial(jax.jit,
                   static_argnames=("ni", "leaf_size", "rows", "ki",
                                    "ml", "cfmt", "stats"))
def traverse_packets5(ctiles: jnp.ndarray, ltiles: jnp.ndarray,
                      ni: int, leaf_size: int, o: V3, d: V3,
                      active: jnp.ndarray | None = None,
                      rows: int | None = None,
                      ki: int | None = None,
                      ml: int | None = None,
                      t_init: jnp.ndarray | None = None,
                      cfmt: str = "f32", stats: bool = False,
                      ldesc: jnp.ndarray | None = None):
    """Drop-in alternative to traverse_packets2 (same tables/API).

    t_init: optional [R] incumbent hit distances (treelet chaining,
    ops/treelets.py) — only strictly closer hits are reported.

    ldesc: instanced-scene leaf descriptors [Lg, 128]
    (models/instanced.py) — leaf drains read the shared tile slot and
    transform rays into instance space (itf mode).

    stats=True (measurement only, tools/probe_leaf_waste.py) returns
    (Hit, stats [G, 8, 128]) where per packet-grid block lane 0 of
    rows 0/1/2 counts leaf drains / drains where no lane improved /
    drains a per-lane slab re-test vs current t would have skipped."""
    rb = rows or PACKET_ROWS5
    ki = ki or KI
    ml = ml or ML
    if rb not in (1, 2, 4, 8, 16, 32):
        raise ValueError("rows must be 1, 2, 4, 8, 16 or 32")
    if not (1 <= ki <= 8 and 1 <= ml <= 8):
        raise ValueError("ki/ml must be in 1..8")
    # rb > 8 widens the per-instance ray block so ONE stack walk
    # serves 2048/4096 rays: per-visit cost is latency-dominated
    # (PLAN_TPU.md), so the extra vector work largely fills stalls
    # while the sync/scalar overhead amortizes over more rays.
    blk = max(rb, 8)
    r = o.x.shape[0]
    pad = (-r) % (blk * 128)
    rp = r + pad

    def prep(a, fill=0.0):
        if pad:
            a = jnp.concatenate([a, jnp.full((pad,), fill, a.dtype)])
        return a.reshape(rp // 128, 128)

    act = (jnp.ones((r,), jnp.int32) if active is None
           else active.astype(jnp.int32))
    t0 = (jnp.full((r,), BIG, jnp.float32) if t_init is None
          else t_init.astype(jnp.float32))
    args = (prep(o.x), prep(o.y), prep(o.z),
            prep(d.x), prep(d.y), prep(d.z), prep(act, 0),
            prep(t0, BIG))

    grid = rp // (blk * 128)
    ray_spec = pl.BlockSpec((blk, 128), lambda g: (g, 0),
                            memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((rp // 128, 128), jnp.float32),
        jax.ShapeDtypeStruct((rp // 128, 128), jnp.int32),
        jax.ShapeDtypeStruct((rp // 128, 128), jnp.float32),
        jax.ShapeDtypeStruct((rp // 128, 128), jnp.float32),
    ]
    out_specs = [ray_spec] * 4
    if stats:
        out_shape.append(
            jax.ShapeDtypeStruct((grid * 8, 128), jnp.float32))
        out_specs.append(pl.BlockSpec((8, 128), lambda g: (g, 0),
                                      memory_space=pltpu.VMEM))

    if stats and ldesc is not None:
        raise ValueError("stats mode is baked-scene only")
    kernel = functools.partial(_packet_kernel5, ni=ni, k=leaf_size,
                               rb=rb, ki=ki, ml=ml, cfmt=cfmt,
                               stats=stats, itf=ldesc is not None)
    extra = () if ldesc is None else (ldesc,)
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
        * (2 + len(extra))
        + [ray_spec] * 8,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((_STACK + 1,), jnp.int32),
                        pltpu.SMEM((_LQ + 1,), jnp.int32),
                        pltpu.VMEM((8, 128), jnp.float32),
                        pltpu.VMEM((8, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(ctiles, ltiles, *extra, *args)
    t, tri, u, v = outs[:4]

    flat = lambda a: a.reshape(rp)[:r]
    hit = Hit(t=flat(t), tri=flat(tri), u=flat(u), v=flat(v))
    if stats:
        return hit, outs[4].reshape(grid, 8, 128)
    return hit
