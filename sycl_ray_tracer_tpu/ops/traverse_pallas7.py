"""Pallas packet traversal v7: W independent subpacket walks.

Generalizes v5 (one walk over the whole ray block) and v6 (two
half-block walks) to W independent walks of `rpw` rows each, all
sharing ONE vector->scalar readback per iteration:

- Walk w owns rows [w*rpw, (w+1)*rpw) of the (W*rpw, 128) ray block,
  a private SSZ-slot SMEM stack region, and a private LSZ-slot SMEM
  leaf ring. After the wavefront's coherence sort its rpw*128 rays are
  CONSECUTIVE sorted rays, so each walk's visit union is tighter than
  the full block's — the union tax (PLAN_TPU.md roadmap #1) shrinks
  with W while the per-iteration sync cost stays ONE readback for all
  W*ki node visits.
- Per iteration each walk pops ki nodes (gated; a drained walk
  degenerates to no-op pops while the others finish) and processes ml
  leaves from its ring (leaf visits need no readback; their MT chains
  fill the latency shadow).
- All W*ki child key/id columns merge into one keybuf/idbuf store ->
  one sync -> 8*W*ki cheap scalar reads, then per-walk branch-free
  ordered pushes exactly as v5 (trash slots sit OUTSIDE the usable
  stack/ring ranges; ring-occupancy guard gates pops into drain-only
  iterations, round-2 advisor).

The experiment this enables (round-3 VERDICT #1): sweep W x rpw on
sorted bounce packets to find where union shrink beats the extra
total visits (sum of per-walk unions >= union of the block).

Fill-the-role citation as v1-v6: the reference's rtcIntersect1
(trace_ray.hpp:22, the hot inner call of its wavefront/megakernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sycl_ray_tracer_tpu.ops.intersect import BIG, TNEAR, Hit, _DET_EPS
from sycl_ray_tracer_tpu.ops.vec import V3

_SSZ = 128            # stack slots per walk
_MISS = np.float32(BIG) * np.float32(0.5)


def _bcast_gather(tile, lane, n=8):
    idx = jnp.full((n, 128), lane, jnp.int32)
    return jnp.take_along_axis(tile, idx, axis=1)


def _packet_kernel7(ctiles_ref, ltiles_ref,
                    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                    act_ref, t0_ref, t_ref, tri_ref, u_ref, v_ref,
                    stack_ref, lq_ref, keybuf_ref, idbuf_ref,
                    *, ni: int, k: int, nw: int, rpw: int, ki: int,
                    ml: int, lsz: int, cfmt: str = "f32"):
    blk = nw * rpw
    rows = list(range(blk))
    walk_rows = [rows[w * rpw:(w + 1) * rpw] for w in range(nw)]
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

    t0 = [jnp.where(a, t0_ref[r:r + 1, :], jnp.float32(-BIG))
          for r, a in zip(rows, act)]
    tm1 = [jnp.full((1, 128), -1, jnp.int32) for _ in rows]
    zz = [jnp.zeros((1, 128), jnp.float32) for _ in rows]

    for w in range(nw):
        stack_ref[w * _SSZ] = 0     # each walk starts at the root
    jrow = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    fni = jnp.float32(ni)

    one = jnp.int32(1)
    zero = jnp.int32(0)
    carry0 = (tuple(one for _ in range(nw)),      # sp per walk
              tuple(zero for _ in range(nw)),     # leaf ring head
              tuple(zero for _ in range(nw)),     # leaf ring tail
              tuple(t0), tuple(tm1), tuple(zz), tuple(zz))

    def cond(c):
        sps, lhs, lts = c[0], c[1], c[2]
        alive = (sps[0] > 0) | (lts[0] > lhs[0])
        for w in range(1, nw):
            alive = alive | (sps[w] > 0) | (lts[w] > lhs[w])
        return alive

    def body(c):
        sps, lhs, lts, t_best, tri_best, ub, vb = c
        sps = list(sps)
        lhs = list(lhs)
        lts = list(lts)

        # ---- W*ki node visits -> merged key/id columns ----
        kcomb = jnp.full((8, 128), jnp.float32(BIG))
        icomb = jnp.zeros((8, 128), jnp.float32)
        have_i = [[None] * ki for _ in range(nw)]
        for w in range(nw):
            sbase = w * _SSZ
            # ring-occupancy guard: drain-only iterations when this
            # walk's pending leaves could wrap its ring
            room = (lts[w] - lhs[w]) < (lsz - 8 * ki)
            for kk in range(ki):
                have = ((sps[w] > kk) & room).astype(jnp.int32)
                have_i[w][kk] = have
                nd = stack_ref[sbase + jnp.maximum(sps[w] - 1 - kk, 0)]
                nd = jnp.minimum(nd, ni - 1)
                if cfmt == "bf16p":
                    tile = ctiles_ref[nd // 32]
                    cbase = 4 * (nd % 32)

                    def unpk(p):
                        wd = jax.lax.bitcast_convert_type(p, jnp.uint32)
                        lo = jax.lax.bitcast_convert_type(
                            wd << 16, jnp.float32)
                        hi = jax.lax.bitcast_convert_type(
                            wd & jnp.uint32(0xFFFF0000), jnp.float32)
                        return lo, hi

                    lox, hix = unpk(_bcast_gather(tile, cbase + 0))
                    loy, hiy = unpk(_bcast_gather(tile, cbase + 1))
                    loz, hiz = unpk(_bcast_gather(tile, cbase + 2))
                    idlane = cbase + 3
                else:
                    tile = ctiles_ref[nd // 16]
                    cbase = 8 * (nd % 16)
                    lox = _bcast_gather(tile, cbase + 0)
                    loy = _bcast_gather(tile, cbase + 1)
                    loz = _bcast_gather(tile, cbase + 2)
                    hix = _bcast_gather(tile, cbase + 3)
                    hiy = _bcast_gather(tile, cbase + 4)
                    hiz = _bcast_gather(tile, cbase + 5)
                    idlane = cbase + 6
                key_acc = jnp.full((8, 128), jnp.float32(BIG))
                for i in walk_rows[w]:
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
                key = jnp.min(key_acc, axis=1, keepdims=True)  # (8,1)
                lane = w * ki + kk
                kcomb = jnp.where(lane_i == lane,
                                  jnp.broadcast_to(key, (8, 128)),
                                  kcomb)
                icomb = jnp.where(lane_i == lane,
                                  _bcast_gather(tile, idlane), icomb)
            n_pop = have_i[w][0]
            for kk in range(1, ki):
                n_pop = n_pop + have_i[w][kk]
            sps[w] = sps[w] - n_pop

        # ---- per-walk leaf visits from the rings (no readback) ----
        t_new = list(t_best)
        tri_new = list(tri_best)
        u_new = list(ub)
        v_new = list(vb)
        for w in range(nw):
            qbase = w * lsz
            for mm in range(ml):
                have_l = ((lts[w] - lhs[w]) > mm)
                lf = lq_ref[qbase + (lhs[w] + mm) % lsz]
                lfc = jnp.maximum(lf - ni, 0)
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
                for i in walk_rows[w]:
                    px = dy[i] * e2z - dz[i] * e2y
                    py = dz[i] * e2x - dx[i] * e2z
                    pz = dx[i] * e2y - dy[i] * e2x
                    det = e1x * px + e1y * py + e1z * pz
                    inv_det = jnp.where(jnp.abs(det) > _DET_EPS,
                                        1.0 / det, 0.0)
                    tx = ox[i] - v0x
                    ty = oy[i] - v0y
                    tz = oz[i] - v0z
                    uu = (tx * px + ty * py + tz * pz) * inv_det
                    qx = ty * e1z - tz * e1y
                    qy = tz * e1x - tx * e1z
                    qz = tx * e1y - ty * e1x
                    vv = (dx[i] * qx + dy[i] * qy
                          + dz[i] * qz) * inv_det
                    tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                    ok = ((jnp.abs(det) > _DET_EPS)
                          & (uu >= 0.0) & (vv >= 0.0)
                          & (uu + vv <= 1.0)
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
            lhs[w] = lhs[w] + jnp.minimum(lts[w] - lhs[w], ml)

        # ---- ONE readback sync for all W*ki nodes ----
        keybuf_ref[:] = kcomb
        idbuf_ref[:] = icomb

        for w in range(nw):
            sbase = w * _SSZ
            qbase = w * lsz
            for kk in reversed(range(ki)):
                lane = w * ki + kk
                keys = [keybuf_ref[j, lane] for j in range(8)]
                ids = [idbuf_ref[j, lane] for j in range(8)]
                isl = [(ids[j] >= fni).astype(jnp.int32)
                       for j in range(8)]
                hits = [((keys[j] < _MISS).astype(jnp.int32)
                         * have_i[w][kk]) for j in range(8)]
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
                        farther = (keys[j2] > keys[j]) if j2 < j \
                            else (keys[j2] >= keys[j])
                        ahead = ahead + ihit[j2] * farther.astype(
                            jnp.int32)
                    # trash slot nw*_SSZ sits OUTSIDE every walk's range
                    slot = jnp.where(ihit[j] == 1,
                                     sbase + sps[w] + ahead,
                                     nw * _SSZ)
                    stack_ref[slot] = ids[j].astype(jnp.int32)
                sps[w] = sps[w] + n_int
                lcnt = jnp.int32(0)
                for j in range(8):
                    slot = jnp.where(lhit[j] == 1,
                                     qbase + (lts[w] + lcnt) % lsz,
                                     nw * lsz)
                    lq_ref[slot] = ids[j].astype(jnp.int32)
                    lcnt = lcnt + lhit[j]
                lts[w] = lts[w] + lcnt

        return (tuple(sps), tuple(lhs), tuple(lts),
                tuple(t_new), tuple(tri_new), tuple(u_new),
                tuple(v_new))

    out = jax.lax.while_loop(cond, body, carry0)
    t_best, tri_best, ub, vb = out[3], out[4], out[5], out[6]
    for i, r in enumerate(rows):
        t_ref[r:r + 1, :] = jnp.where(act[i], t_best[i], 0.0)
        tri_ref[r:r + 1, :] = jnp.where(act[i], tri_best[i], -1)
        u_ref[r:r + 1, :] = ub[i]
        v_ref[r:r + 1, :] = vb[i]


@functools.partial(jax.jit,
                   static_argnames=("ni", "leaf_size", "walks", "rpw",
                                    "ki", "ml", "cfmt"))
def traverse_packets7(ctiles: jnp.ndarray, ltiles: jnp.ndarray,
                      ni: int, leaf_size: int, o: V3, d: V3,
                      active: jnp.ndarray | None = None,
                      walks: int = 4, rpw: int = 2,
                      ki: int = 1, ml: int = 2,
                      t_init: jnp.ndarray | None = None,
                      cfmt: str = "f32") -> Hit:
    """W-walk variant of traverse_packets5/6 (same tables/API).

    walks*rpw must be 8, 16 or 32 (the ray-block sublane count);
    walks*ki <= 128 (key lanes). t_init: optional [R] incumbent hit
    distances (treelet chaining) — only strictly closer hits report.
    """
    if walks * rpw not in (8, 16, 32):
        raise ValueError("walks*rpw must be 8, 16 or 32")
    if not (1 <= ki <= 8 and 1 <= ml <= 8 and walks * ki <= 128):
        raise ValueError("bad ki/ml/walks")
    blk = walks * rpw
    lsz = max(4096 // walks, 256)
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
    kernel = functools.partial(_packet_kernel7, ni=ni, k=leaf_size,
                               nw=walks, rpw=rpw, ki=ki, ml=ml,
                               lsz=lsz, cfmt=cfmt)
    t, tri, u, v = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
        + [ray_spec] * 8,
        out_specs=[ray_spec] * 4,
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((walks * _SSZ + 1,), jnp.int32),
                        pltpu.SMEM((walks * lsz + 1,), jnp.int32),
                        pltpu.VMEM((8, 128), jnp.float32),
                        pltpu.VMEM((8, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(ctiles, ltiles, *args)

    flat = lambda a: a.reshape(rp)[:r]
    return Hit(t=flat(t), tri=flat(tri).astype(jnp.int32),
               u=flat(u), v=flat(v))
