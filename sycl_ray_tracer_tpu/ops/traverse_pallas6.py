"""Pallas packet traversal v6: DUAL independent half-packet walks.

v5 amortizes the per-iteration vector->scalar readback over ki nodes
popped from ONE shared 1024-ray stack — every visit still pays vector
work at full packet width against the UNION of all 1024 rays' visit
sets. v6 splits the 8-row block into two 512-ray walks (rows 0-3 and
4-7; after the wavefront's coherence sort these are CONSECUTIVE sorted
rays, so each half's union is tighter than the full packet's):

- Each walk owns half the SMEM stack and half the leaf ring and pops
  its own ki nodes per iteration; slab/MT vector math touches only the
  walk's 4 rows (half the per-visit vector work).
- Both walks' child keys/ids merge into ONE keybuf store -> ONE
  readback per iteration (2*ki node visits amortize the sync).
- A finished walk degenerates to gated no-op pops while the other
  drains; iterations = max(U_a, U_b) / ki.

Net accounting vs v5-ki2 (bounce packets): total visits rise
(U_a + U_b >= U_union) but per-visit vector cost halves and the union
per visit shrinks; the experiment decides. Same tables/API as v2/v5.

Fill-the-role citation: rtcIntersect1 (trace_ray.hpp:22).
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

_STACK = 256          # split: walk w owns [w*128, w*128+128)
_HSTACK = 128
_LQ = 4096            # split: walk w owns [w*2048, ...)
_HLQ = 2048
_MISS = np.float32(BIG) * np.float32(0.5)


def _bcast_gather(tile, lane, n=8):
    idx = jnp.full((n, 128), lane, jnp.int32)
    return jnp.take_along_axis(tile, idx, axis=1)


def _packet_kernel6(ctiles_ref, ltiles_ref,
                    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                    act_ref, t0_ref, t_ref, tri_ref, u_ref, v_ref,
                    stack_ref, lq_ref, keybuf_ref, idbuf_ref,
                    *, ni: int, k: int, ki: int, ml: int):
    rows = list(range(8))
    walk_rows = (rows[0:4], rows[4:8])
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

    stack_ref[0] = 0          # walk 0 root
    stack_ref[_HSTACK] = 0    # walk 1 root
    jrow = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    fni = jnp.float32(ni)

    # carry: (sp0, sp1, lh0, lt0, lh1, lt1, t(8), tri(8), u(8), v(8))
    carry0 = (jnp.int32(1), jnp.int32(1),
              jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0),
              tuple(t0), tuple(tm1), tuple(zz), tuple(zz))

    def cond(c):
        sp0, sp1, lh0, lt0, lh1, lt1 = c[:6]
        return ((sp0 > 0) | (lt0 > lh0)
                | (sp1 > 0) | (lt1 > lh1))

    def body(c):
        sp0, sp1, lh0, lt0, lh1, lt1, t_best, tri_best, ub, vb = c
        sps = [sp0, sp1]
        lhs = [lh0, lh1]
        lts = [lt0, lt1]

        kcomb = jnp.full((8, 128), jnp.float32(BIG))
        icomb = jnp.zeros((8, 128), jnp.float32)
        have_i = [[None] * ki for _ in range(2)]
        for w in range(2):
            base = w * _HSTACK
            for kk in range(ki):
                have = (sps[w] > kk).astype(jnp.int32)
                have_i[w][kk] = have
                nd = stack_ref[base + jnp.maximum(sps[w] - 1 - kk, 0)]
                nd = jnp.minimum(nd, ni - 1)
                tile = ctiles_ref[nd // 16]
                cbase = 8 * (nd % 16)
                lox = _bcast_gather(tile, cbase + 0)
                loy = _bcast_gather(tile, cbase + 1)
                loz = _bcast_gather(tile, cbase + 2)
                hix = _bcast_gather(tile, cbase + 3)
                hiy = _bcast_gather(tile, cbase + 4)
                hiz = _bcast_gather(tile, cbase + 5)
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
                key = jnp.min(key_acc, axis=1, keepdims=True)
                lane = w * ki + kk
                kcomb = jnp.where(lane_i == lane,
                                  jnp.broadcast_to(key, (8, 128)),
                                  kcomb)
                icomb = jnp.where(lane_i == lane,
                                  _bcast_gather(tile, cbase + 6),
                                  icomb)
            sps[w] = sps[w] - sum(have_i[w])

        # ---- per-walk leaf visits (no readback needed) ----
        t_new = list(t_best)
        tri_new = list(tri_best)
        u_new = list(ub)
        v_new = list(vb)
        for w in range(2):
            lbase_q = w * _HLQ
            for mm in range(ml):
                have_l = ((lts[w] - lhs[w]) > mm)
                lf = lq_ref[lbase_q + (lhs[w] + mm) % _HLQ]
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

        # ---- ONE readback sync for both walks' 2*ki nodes ----
        keybuf_ref[:] = kcomb
        idbuf_ref[:] = icomb

        for w in range(2):
            sbase = w * _HSTACK
            qbase = w * _HLQ
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
                    slot = jnp.where(ihit[j] == 1,
                                     sbase + sps[w] + ahead,
                                     sbase + _HSTACK - 1)
                    stack_ref[slot] = ids[j].astype(jnp.int32)
                sps[w] = sps[w] + n_int
                lcnt = jnp.int32(0)
                for j in range(8):
                    slot = jnp.where(lhit[j] == 1,
                                     qbase + (lts[w] + lcnt) % _HLQ,
                                     _LQ)
                    lq_ref[slot] = ids[j].astype(jnp.int32)
                    lcnt = lcnt + lhit[j]
                lts[w] = lts[w] + lcnt

        return (sps[0], sps[1], lhs[0], lts[0], lhs[1], lts[1],
                tuple(t_new), tuple(tri_new), tuple(u_new),
                tuple(v_new))

    out = jax.lax.while_loop(cond, body, carry0)
    t_best, tri_best, ub, vb = out[6], out[7], out[8], out[9]
    for i, r in enumerate(rows):
        t_ref[r:r + 1, :] = jnp.where(act[i], t_best[i], 0.0)
        tri_ref[r:r + 1, :] = jnp.where(act[i], tri_best[i], -1)
        u_ref[r:r + 1, :] = ub[i]
        v_ref[r:r + 1, :] = vb[i]


@functools.partial(jax.jit,
                   static_argnames=("ni", "leaf_size", "rows", "ki",
                                    "ml"))
def traverse_packets6(ctiles: jnp.ndarray, ltiles: jnp.ndarray,
                      ni: int, leaf_size: int, o: V3, d: V3,
                      active: jnp.ndarray | None = None,
                      rows: int | None = None,
                      ki: int = 2, ml: int = 2,
                      t_init: jnp.ndarray | None = None) -> Hit:
    """Dual-walk variant of traverse_packets2/5 (same tables/API).
    `rows` is accepted for harness compatibility and ignored (the
    split is fixed at two 4-row walks)."""
    del rows
    if not (1 <= ki <= 4 and 1 <= ml <= 8):
        raise ValueError("ki in 1..4 (2 walks share 8 key lanes)")
    r = o.x.shape[0]
    pad = (-r) % 1024
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

    grid = rp // 1024
    ray_spec = pl.BlockSpec((8, 128), lambda g: (g, 0),
                            memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((rp // 128, 128), jnp.float32),
        jax.ShapeDtypeStruct((rp // 128, 128), jnp.int32),
        jax.ShapeDtypeStruct((rp // 128, 128), jnp.float32),
        jax.ShapeDtypeStruct((rp // 128, 128), jnp.float32),
    ]
    kernel = functools.partial(_packet_kernel6, ni=ni, k=leaf_size,
                               ki=ki, ml=ml)
    t, tri, u, v = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
        + [ray_spec] * 8,
        out_specs=[ray_spec] * 4,
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((_STACK,), jnp.int32),
                        pltpu.SMEM((_LQ + 1,), jnp.int32),
                        pltpu.VMEM((8, 128), jnp.float32),
                        pltpu.VMEM((8, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(ctiles, ltiles, *args)

    def unprep(a):
        return a.reshape(rp)[:r]

    return Hit(t=unprep(t), tri=unprep(tri).astype(jnp.int32),
               u=unprep(u), v=unprep(v))
