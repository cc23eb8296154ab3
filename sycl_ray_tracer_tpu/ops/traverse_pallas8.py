"""Pallas packet traversal v8: slab-only walk + batched MXU leaf
drains (round-5 VERDICT #1).

v5 (traverse_pallas5.py) retires ki internal nodes + ml leaves per
sync iteration, paying a ~210-235-cycle VPU Moller-Trumbore block per
leaf visit. Round 4 measured a per-invocation dot_general at the
leaf-visit shape to carry ~200 cycles of FIXED cost and declared the
MXU a NO-GO — at the wrong granularity: batching KB=8 drained leaves
into ONE [8, 48*KB] x [8, rb*128] Woop dot amortizes the fixed cost
to ~136 cycles per leaf-visit including the full t/u/v/tri winner
epilogue (tools/probe_mxu_batch.py, slope method, verified trips).

Structure per 1024-ray packet walk:
- INNER while: pop ki internal nodes per sync iteration (v5's slab
  phase verbatim — merged keybuf readback, rank-ordered pushes),
  routing leaf ids into the SMEM ring, until KB leaves are pending or
  the stack empties. No leaf work, so the inner carry is 3 scalars.
- OUTER body: ONE batched drain — KB dynamic woop-tile loads
  (2 leaves/tile, ops/woop.py), one dot_general, per-leaf epilogue
  against the batch-start t (stale-t semantics: final hits are
  IDENTICAL to sequential drains since the closest-hit min is
  order-free; visits grow ~6-8.5%, tools/probe_defer_t.py).

The t/u/v arithmetic is the Woop transform (algebraically equal to
MT; float tie-breaks can differ at ~5e-4 rel — RMSE-level noise, see
ops/woop.py). Hit ids are leaf-slot based exactly like v5
(lfc * k + row winner).

Fill-the-role citation as v1-v7: the reference's rtcIntersect1
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

from sycl_ray_tracer_tpu.ops.intersect import BIG, TNEAR, Hit
from sycl_ray_tracer_tpu.ops.vec import V3

KI8 = int(os.environ.get("SRT_V8_KI", "2"))   # internal nodes / iter
KB8 = int(os.environ.get("SRT_V8_KB", "8"))   # leaves / batched drain
# drain-dot precision mode: f32x6 (6 bf16-limb terms in K, f32-exact)
# | f32x3 (3 terms, ~2^-16 rel) | bf16 (1 pass) | highest (Mosaic)
DOTP8 = os.environ.get("SRT_V8_DOTP", "f32x6")
_STACK = 256
_LQ = 128
_MISS = np.float32(BIG) * np.float32(0.5)
_PRECISION = {"bf16": jax.lax.Precision.DEFAULT,
              "highest": jax.lax.Precision.HIGHEST}


def _split3(a):
    """f32 -> (hi, mid, lo) bf16 limbs with a ~= hi + mid + lo."""
    hi = a.astype(jnp.bfloat16)
    r1 = a - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _bcast_gather(tile, lane, n=8):
    idx = jnp.full((n, 128), lane, jnp.int32)
    return jnp.take_along_axis(tile, idx, axis=1)


def _traverse_subpacket8(ctiles_ref, wtiles_ref,
                         ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                         act_ref, t0_ref,
                         t_ref, tri_ref, u_ref, v_ref,
                         stack_ref, lq_ref, keybuf_ref, idbuf_ref,
                         *, ni: int, nlt: int, k: int, rb: int,
                         ki: int, kb: int, row0: int,
                         cfmt: str = "f32", dotp: str = "f32x6"):
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

    nw = rb * 128

    # loop-invariant wide ray matrix for the Woop dot:
    # rows (ox,oy,oz,1,dx,dy,dz,0) x (rb*128) rays
    oxw = jnp.concatenate(ox, axis=1)
    oyw = jnp.concatenate(oy, axis=1)
    ozw = jnp.concatenate(oz, axis=1)
    dxw = jnp.concatenate(dx, axis=1)
    dyw = jnp.concatenate(dy, axis=1)
    dzw = jnp.concatenate(dz, axis=1)
    ones_w = jnp.ones((1, nw), jnp.float32)
    zeros_w = jnp.zeros((1, nw), jnp.float32)
    rays_w = jnp.concatenate(
        [oxw, oyw, ozw, ones_w, dxw, dyw, dzw, zeros_w], axis=0)
    if dotp in ("f32x3", "f32x6"):
        # bf16-limb split of the ray matrix, once per walk (loop-
        # invariant). The multi-pass f32 product expansion rides the
        # CONTRACTION dim: term pairs (Wi, Rj) concatenated along K
        # give ONE MXU pass at K=24 (3-term, ~2^-16 rel) or K=48
        # (6-term, f32-equivalent) — K-growth is nearly free
        # (tools/probe_mxu_batch.py: bx3 126 / bx6 158 cyc per leaf
        # visit vs Mosaic HIGHEST's ~800-cyc-per-batch 6 passes).
        rhi, rmid, rlo = _split3(rays_w)
        if dotp == "f32x3":
            rays_k = jnp.concatenate([rhi, rmid, rhi], axis=0)
        else:
            rays_k = jnp.concatenate([rhi, rmid, rhi, rlo, rmid, rhi],
                                     axis=0)
    else:
        rays_k = rays_w

    # WIDE hit state (1, rb*128): slab tests slice per-row 128-lane
    # windows (free at 128-aligned offsets); the batched epilogue
    # updates the whole width at once.
    t0w = jnp.concatenate(
        [jnp.where(a, t0_ref[r:r + 1, :], jnp.float32(-BIG))
         for r, a in zip(rows, act)], axis=1)
    triw0 = jnp.full((1, nw), -1, jnp.int32)
    zw0 = jnp.zeros((1, nw), jnp.float32)

    stack_ref[0] = 0
    jrow = jax.lax.broadcasted_iota(jnp.int32, (8, nw), 0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    fni = jnp.float32(ni)

    carry0 = (jnp.int32(1), jnp.int32(0), jnp.int32(0),
              t0w, triw0, zw0, zw0)

    def cond(c):
        return (c[0] > 0) | (c[2] > c[1])

    def body(c):
        sp0, lh, lt, tbw, trib, ubw, vbw = c

        # ---------------- inner: slab-only walk ----------------
        def w_cond(wc):
            sp, _, wlt = wc
            return (sp > 0) & ((wlt - lh) < kb)

        def w_body(wc):
            sp, _, wlt = wc
            have_i = [(sp > kk).astype(jnp.int32) for kk in range(ki)]
            nds = [stack_ref[jnp.maximum(sp - 1 - kk, 0)]
                   for kk in range(ki)]
            n_pop = have_i[0]
            for kk in range(1, ki):
                n_pop = n_pop + have_i[kk]
            sp = sp - n_pop

            kcomb = jnp.full((8, 128), jnp.float32(BIG))
            icomb = jnp.zeros((8, 128), jnp.float32)
            for kk in range(ki):
                nd = jnp.minimum(nds[kk], ni - 1)
                if cfmt == "bf16p":
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
                    sl = slice(i * 128, (i + 1) * 128)
                    t_i = tbw[:, sl]
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
                           & (tmin < t_i))
                    key_acc = jnp.minimum(
                        key_acc, jnp.where(hit, tmin, jnp.float32(BIG)))
                key = jnp.min(key_acc, axis=1, keepdims=True)
                kcomb = jnp.where(lane_i == kk,
                                  jnp.broadcast_to(key, (8, 128)),
                                  kcomb)
                icomb = jnp.where(lane_i == kk,
                                  _bcast_gather(tile, idlane), icomb)

            keybuf_ref[:] = kcomb
            idbuf_ref[:] = icomb

            for kk in reversed(range(ki)):
                keys = [keybuf_ref[j, kk] for j in range(8)]
                ids = [idbuf_ref[j, kk] for j in range(8)]
                isl = [(ids[j] >= fni).astype(jnp.int32)
                       for j in range(8)]
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
                        ahead = ahead + ihit[j2] * farther.astype(
                            jnp.int32)
                    slot = jnp.where(ihit[j] == 1, sp + ahead, _STACK)
                    stack_ref[slot] = ids[j].astype(jnp.int32)
                sp = sp + n_int
                lcnt = jnp.int32(0)
                for j in range(8):
                    slot = jnp.where(lhit[j] == 1,
                                     (wlt + lcnt) % _LQ, _LQ)
                    lq_ref[slot] = ids[j].astype(jnp.int32)
                    lcnt = lcnt + lhit[j]
                wlt = wlt + lcnt
            return (sp, lh, wlt)

        sp, _, lt = jax.lax.while_loop(w_cond, w_body, (sp0, lh, lt))

        # ---------------- outer: one batched MXU drain ----------------
        pend = lt - lh
        cols = []
        lfcs = []
        for j in range(kb):
            lf = lq_ref[(lh + j) % _LQ]
            lfc = jnp.clip(lf - ni, 0, nlt * 2 - 1)
            lfcs.append(lfc)
            tile = wtiles_ref[jnp.minimum(lfc // 2, nlt - 1)]
            w_j = jnp.where(lfc % 2 == 1, tile[:, 64:112],
                            tile[:, 0:48])
            cols.append(w_j)
        w = jnp.concatenate(cols, axis=1)          # (8, 48*kb)
        # Precision matters: the MXU's DEFAULT f32 dot is a single
        # bf16 pass — 8-bit mantissas on the Woop coefficients turned
        # 5.8% of sponza bounce hits into misses (round-5 bisect:
        # interpret mode exact, real TPU wrong at any kb/ki), and
        # Mosaic's precision=HIGHEST costs ~800 cyc/batch (6 serial
        # passes; bounce kernel 4.0 vs v5 5.3). The production path
        # folds the limb-product expansion into K instead (see the
        # rays_k comment above): exact hits at one-pass cost.
        if dotp in ("f32x3", "f32x6"):
            whi, wmid, wlo = _split3(w)
            if dotp == "f32x3":
                wk = jnp.concatenate([whi, whi, wmid], axis=0)
            else:
                wk = jnp.concatenate([whi, whi, wmid, whi, wmid, wlo],
                                     axis=0)
            out = jax.lax.dot_general(
                wk, rays_k,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (48*kb, nw)
        else:
            out = jax.lax.dot_general(
                w, rays_k,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_PRECISION[dotp])          # (48*kb, nw)

        best_all = jnp.full((1, nw), jnp.float32(BIG))
        tri_all = jnp.full((1, nw), -1, jnp.int32)
        u_all = jnp.zeros((1, nw), jnp.float32)
        v_all = jnp.zeros((1, nw), jnp.float32)
        for j in range(kb):
            o = 48 * j
            opx = out[o + 0: o + 8]
            opy = out[o + 8: o + 16]
            opz = out[o + 16: o + 24]
            dpx = out[o + 24: o + 32]
            dpy = out[o + 32: o + 40]
            dpz = out[o + 40: o + 48]
            neg_inv = jnp.float32(-1.0) / dpz
            tt = opz * neg_inv
            uu = opx + tt * dpx
            vv = opy + tt * dpy
            ok = ((uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                  & (tt > TNEAR) & (tt < tbw) & (pend > j))
            ttm = jnp.where(ok, tt, jnp.float32(BIG))
            best = jnp.min(ttm, axis=0, keepdims=True)
            jbest = jnp.min(jnp.where(ttm <= best, jrow, 8),
                            axis=0, keepdims=True)
            one_hot = jrow == jbest
            usel = jnp.sum(jnp.where(one_hot, uu, 0.0),
                           axis=0, keepdims=True)
            vsel = jnp.sum(jnp.where(one_hot, vv, 0.0),
                           axis=0, keepdims=True)
            take = best < best_all
            best_all = jnp.where(take, best, best_all)
            tri_all = jnp.where(take, lfcs[j] * k + jbest, tri_all)
            u_all = jnp.where(take, usel, u_all)
            v_all = jnp.where(take, vsel, v_all)
        has = best_all < _MISS
        tbw = jnp.where(has, best_all, tbw)
        trib = jnp.where(has, tri_all, trib)
        ubw = jnp.where(has, u_all, ubw)
        vbw = jnp.where(has, v_all, vbw)
        lh = lh + jnp.minimum(pend, kb)

        return (sp, lh, lt, tbw, trib, ubw, vbw)

    fin = jax.lax.while_loop(cond, body, carry0)
    tbw, trib, ubw, vbw = fin[3:7]

    for i, r in enumerate(rows):
        sl = slice(i * 128, (i + 1) * 128)
        t_ref[r:r + 1, :] = jnp.where(act[i], tbw[:, sl], 0.0)
        tri_ref[r:r + 1, :] = jnp.where(act[i], trib[:, sl], -1)
        u_ref[r:r + 1, :] = ubw[:, sl]
        v_ref[r:r + 1, :] = vbw[:, sl]


def _packet_kernel8(ctiles_ref, wtiles_ref,
                    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                    act_ref, t0_ref, t_ref, tri_ref, u_ref, v_ref,
                    stack_ref, lq_ref, keybuf_ref, idbuf_ref,
                    *, ni: int, nlt: int, k: int, rb: int, ki: int,
                    kb: int, cfmt: str = "f32", dotp: str = "f32x6"):
    for s in range(max(rb, 8) // rb):
        _traverse_subpacket8(
            ctiles_ref, wtiles_ref, ox_ref, oy_ref, oz_ref,
            dx_ref, dy_ref, dz_ref, act_ref, t0_ref,
            t_ref, tri_ref, u_ref, v_ref,
            stack_ref, lq_ref, keybuf_ref, idbuf_ref,
            ni=ni, nlt=nlt, k=k, rb=rb, ki=ki, kb=kb, row0=s * rb,
            cfmt=cfmt, dotp=dotp)


@functools.partial(jax.jit,
                   static_argnames=("ni", "leaf_size", "rows", "ki",
                                    "kb", "cfmt", "dotp"))
def traverse_packets8(ctiles: jnp.ndarray, wtiles: jnp.ndarray,
                      ni: int, leaf_size: int, o: V3, d: V3,
                      active: jnp.ndarray | None = None,
                      rows: int | None = None,
                      ki: int | None = None,
                      kb: int | None = None,
                      t_init: jnp.ndarray | None = None,
                      cfmt: str = "f32", dotp: str = None):
    """v8 traversal: same API as traverse_packets5 but the leaf table
    is the WOOP tile table (ops/woop.pack_wtiles_affine_np), and leaf
    drains run batched on the MXU. Returns leaf-slot hit ids exactly
    like v5 (caller applies the SAH remap)."""
    rb = rows or 8
    ki = ki or KI8
    kb = kb or KB8
    if rb not in (1, 2, 4, 8, 16, 32):
        raise ValueError("rows must be 1, 2, 4, 8, 16 or 32")
    if not (1 <= ki <= 8 and 1 <= kb <= 16):
        raise ValueError("ki must be 1..8, kb 1..16")
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
    kernel = functools.partial(_packet_kernel8, ni=ni,
                               nlt=int(wtiles.shape[0]), k=leaf_size,
                               rb=rb, ki=ki, kb=kb, cfmt=cfmt,
                               dotp=dotp or DOTP8)
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
        + [ray_spec] * 8,
        out_specs=[ray_spec] * 4,
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((_STACK + 1,), jnp.int32),
                        pltpu.SMEM((_LQ + 1,), jnp.int32),
                        pltpu.VMEM((8, 128), jnp.float32),
                        pltpu.VMEM((8, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(ctiles, wtiles, *args)
    t, tri, u, v = outs[:4]

    flat = lambda a: a.reshape(rp)[:r]
    return Hit(t=flat(t), tri=flat(tri), u=flat(u), v=flat(v))
