#!/usr/bin/env python
"""Batched-drain MXU probe (round-5 VERDICT #1).

Round-4's probe_mxu_mt measured a ~200-cycle FIXED cost per
dot_general at the leaf-visit shape (M=48, N=1024, K=8) and concluded
NO-GO for per-visit MXU dots. The round-4 judge's counter: the fixed
cost is per INVOCATION — batch k drained leaves into ONE dot
[8, 48k] x [8, 1024] -> [48k, 1024] and it amortizes k-fold, IF the
fixed cost does not itself scale with the output size (if it is
result-layout movement, M-growth pays it all back).

Modes (fixed trip count, verified via it_ref; np.asarray fence; slope
method — per-call fixed cost cancels):
  mt       current 9-gather + 8-row MT block, 1 leaf/iteration
           (baseline: ~244 cyc/visit round 4)
  mm       1-leaf dot + trivial consume (round-4 control: ~219)
  mmb_K    K dynamically-indexed woop tiles concatenated to [8,48K],
           ONE dot, trivial consume — the dot-cost-vs-M scaling
           curve; per-visit = slope/K
  bat_K    full batched drain: K tile loads + concat + ONE dot +
           per-leaf epilogue (t/u/v/tri winner vs a shared stale tb,
           batch-level final update) — kernel-parity output semantics
           of K deferred drains

Go/no-go: bat_K per-visit meaningfully under mt's 244 cyc at some K
(the stale-t semantics are near-free per probe_leaf_waste: slabfail
3.1%). Role match: the triangle test of
/root/reference/src/trace_ray.hpp:22, batched the TPU way.
"""

import functools
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))

NL = 256
RB = 8            # ray rows (1024 rays)
EPS = np.float32(1e-9)
TNEAR = np.float32(1e-4)
BIG = np.float32(1e30)
MISS = BIG * np.float32(0.5)


def bg(tile, lane, n=8):
    idx = jnp.full((n, 128), lane, jnp.int32)
    return jnp.take_along_axis(tile, idx, axis=1)


def make_kernel(iters, mode, kb):
    """iters = while-loop trips; each trip visits `kb` leaves."""

    def kernel(wtiles_ref, ltiles_ref, rays_ref, out_ref, it_ref):
        jrow = jax.lax.broadcasted_iota(jnp.int32, (8, RB * 128), 0)

        ox = [rays_ref[0:1, i * 128:(i + 1) * 128] for i in range(RB)]
        oy = [rays_ref[1:2, i * 128:(i + 1) * 128] for i in range(RB)]
        oz = [rays_ref[2:3, i * 128:(i + 1) * 128] for i in range(RB)]
        dx = [rays_ref[4:5, i * 128:(i + 1) * 128] for i in range(RB)]
        dy = [rays_ref[5:6, i * 128:(i + 1) * 128] for i in range(RB)]
        dz = [rays_ref[6:7, i * 128:(i + 1) * 128] for i in range(RB)]
        rays_w = rays_ref[:, :]

        big_w = jnp.full((1, RB * 128), BIG)
        carry0 = (jnp.int32(0), big_w,
                  jnp.full((1, RB * 128), -1, jnp.int32),
                  big_w * 0, big_w * 0)

        def cond(c):
            return c[0] < iters

        def mt_body(c):
            it, tb, trib, ub, vb = c
            jrow8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            lfc = it % NL
            ltile = ltiles_ref[jnp.minimum(lfc // 8, NL // 8 - 1)]
            lbase = 16 * (lfc % 8)
            v0x = bg(ltile, lbase + 0)
            v0y = bg(ltile, lbase + 1)
            v0z = bg(ltile, lbase + 2)
            e1x = bg(ltile, lbase + 3)
            e1y = bg(ltile, lbase + 4)
            e1z = bg(ltile, lbase + 5)
            e2x = bg(ltile, lbase + 6)
            e2y = bg(ltile, lbase + 7)
            e2z = bg(ltile, lbase + 8)
            tb_n, trib_n, ub_n, vb_n = [], [], [], []
            for i in range(RB):
                sl = slice(i * 128, (i + 1) * 128)
                t_i = tb[:, sl]
                px = dy[i] * e2z - dz[i] * e2y
                py = dz[i] * e2x - dx[i] * e2z
                pz = dx[i] * e2y - dy[i] * e2x
                det = e1x * px + e1y * py + e1z * pz
                inv_det = jnp.where(jnp.abs(det) > EPS, 1.0 / det, 0.0)
                tx = ox[i] - v0x
                ty = oy[i] - v0y
                tz = oz[i] - v0z
                uu = (tx * px + ty * py + tz * pz) * inv_det
                qx = ty * e1z - tz * e1y
                qy = tz * e1x - tx * e1z
                qz = tx * e1y - ty * e1x
                vv = (dx[i] * qx + dy[i] * qy + dz[i] * qz) * inv_det
                tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                ok = ((jnp.abs(det) > EPS)
                      & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                      & (tt > TNEAR) & (tt < t_i))
                ttm = jnp.where(ok, tt, BIG)
                best = jnp.min(ttm, axis=0, keepdims=True)
                has = best < MISS
                jbest = jnp.min(jnp.where(ttm <= best, jrow8, 8),
                                axis=0, keepdims=True)
                one_hot = jrow8 == jbest
                usel = jnp.sum(jnp.where(one_hot, uu, 0.0),
                               axis=0, keepdims=True)
                vsel = jnp.sum(jnp.where(one_hot, vv, 0.0),
                               axis=0, keepdims=True)
                tb_n.append(jnp.where(has, best, t_i))
                trib_n.append(jnp.where(has, lfc * 8 + jbest,
                                        trib[:, sl]))
                ub_n.append(jnp.where(has, usel, ub[:, sl]))
                vb_n.append(jnp.where(has, vsel, vb[:, sl]))
            return (it + 1, jnp.concatenate(tb_n, axis=1),
                    jnp.concatenate(trib_n, axis=1),
                    jnp.concatenate(ub_n, axis=1),
                    jnp.concatenate(vb_n, axis=1))

        def load_batch(it):
            """kb dynamically-indexed woop tiles -> [8, 48*kb]."""
            cols = []
            for j in range(kb):
                lfc = (it * kb + j) % NL
                cols.append(wtiles_ref[lfc][:, 0:48])
            return jnp.concatenate(cols, axis=1) if kb > 1 else cols[0]

        def load_batch_compact(it):
            """kb compact tiles (4 leaves per (8,128) tile, 24 lanes
            each: rows 0-2 = M rows, row 3 = translation) -> [8, 24*kb]
            with the real 4-way quarter select the production storage
            needs (static slices + 3 wheres; dynamic lane offsets are
            not expressible in Mosaic)."""
            cols = []
            for j in range(kb):
                lfc = (it * kb + j) % NL
                tile = wtiles_ref[lfc // 4]
                qq = lfc % 4
                w = tile[:, 0:24]
                w = jnp.where(qq == 1, tile[:, 32:56], w)
                w = jnp.where(qq == 2, tile[:, 64:88], w)
                w = jnp.where(qq == 3, tile[:, 96:120], w)
                cols.append(w)
            return jnp.concatenate(cols, axis=1) if kb > 1 else cols[0]

        def load_batch_compact32(it):
            """kb compact tiles padded to 32 lanes/leaf (4 per tile,
            ALIGNED quarters): the lane offsets are all multiples of
            32, so the select/concat lowers to cheap quarter-masked
            moves instead of 24-lane misaligned shifts."""
            cols = []
            for j in range(kb):
                lfc = (it * kb + j) % NL
                tile = wtiles_ref[lfc // 4]
                qq = lfc % 4
                w = tile[:, 0:32]
                w = jnp.where(qq == 1, tile[:, 32:64], w)
                w = jnp.where(qq == 2, tile[:, 64:96], w)
                w = jnp.where(qq == 3, tile[:, 96:128], w)
                cols.append(w)
            return jnp.concatenate(cols, axis=1) if kb > 1 else cols[0]

        def cp_body(c):
            """compact32: one dot [8, 32*kb] x [8, 2*RB*128]; cols per
            leaf = u(8) v(8) z(8) pad(8), component-major."""
            it, tb, trib, ub, vb = c
            w = load_batch_compact32(it)
            out = jax.lax.dot_general(
                w, rays2, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            NW = RB * 128
            best_all = jnp.full((1, NW), BIG)
            tri_all = jnp.full((1, NW), -1, jnp.int32)
            u_all = big_w * 0
            v_all = big_w * 0
            for j in range(kb):
                o = 32 * j
                ou = out[o + 0: o + 8, 0:NW]
                ov = out[o + 8: o + 16, 0:NW]
                oz = out[o + 16: o + 24, 0:NW]
                du = out[o + 0: o + 8, NW:]
                dv = out[o + 8: o + 16, NW:]
                dz = out[o + 16: o + 24, NW:]
                neg_inv = jnp.float32(-1.0) / dz
                tt = oz * neg_inv
                uu = ou + tt * du
                vv = ov + tt * dv
                ok = ((uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                      & (tt > TNEAR) & (tt < tb))
                ttm = jnp.where(ok, tt, BIG)
                best = jnp.min(ttm, axis=0, keepdims=True)
                jbest = jnp.min(jnp.where(ttm <= best, jrow, 8),
                                axis=0, keepdims=True)
                one_hot = jrow == jbest
                usel = jnp.sum(jnp.where(one_hot, uu, 0.0),
                               axis=0, keepdims=True)
                vsel = jnp.sum(jnp.where(one_hot, vv, 0.0),
                               axis=0, keepdims=True)
                lfc = (it * kb + j) % NL
                take = best < best_all
                best_all = jnp.where(take, best, best_all)
                tri_all = jnp.where(take, lfc * 8 + jbest, tri_all)
                u_all = jnp.where(take, usel, u_all)
                v_all = jnp.where(take, vsel, v_all)
            has = best_all < MISS
            tb = jnp.where(has, best_all, tb)
            trib = jnp.where(has, tri_all, trib)
            ub = jnp.where(has, u_all, ub)
            vb = jnp.where(has, v_all, vb)
            return (it + 1, tb, trib, ub, vb)

        def split3(a):
            """f32 -> (hi, mid, lo) bf16 limbs, a ~= hi+mid+lo."""
            hi = a.astype(jnp.bfloat16)
            r1 = a - hi.astype(jnp.float32)
            mid = r1.astype(jnp.bfloat16)
            lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
            return hi, mid, lo

        def bx_body(c, terms):
            """bf16-limb K-concatenated dot: the HIGH/HIGHEST
            multi-pass product expansion folded into the contraction
            dim (ONE MXU pass; K-growth is nearly free — the mmk128
            control measured +48 cyc for 16x K). terms=3: error
            ~2^-16; terms=6: ~2^-21 (~f32)."""
            it, tb, trib, ub, vb = c
            w = load_batch(it)
            whi, wmid, wlo = split3(w)
            if terms == 3:
                wk = jnp.concatenate([whi, whi, wmid], axis=0)
                rk = rays3
            else:
                wk = jnp.concatenate([whi, whi, wmid, whi, wmid, wlo],
                                     axis=0)
                rk = rays6
            out = jax.lax.dot_general(
                wk, rk, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (48*kb, RB*128)
            best_all = jnp.full((1, RB * 128), BIG)
            tri_all = jnp.full((1, RB * 128), -1, jnp.int32)
            u_all = big_w * 0
            v_all = big_w * 0
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
                      & (tt > TNEAR) & (tt < tb))
                ttm = jnp.where(ok, tt, BIG)
                best = jnp.min(ttm, axis=0, keepdims=True)
                jbest = jnp.min(jnp.where(ttm <= best, jrow, 8),
                                axis=0, keepdims=True)
                one_hot = jrow == jbest
                usel = jnp.sum(jnp.where(one_hot, uu, 0.0),
                               axis=0, keepdims=True)
                vsel = jnp.sum(jnp.where(one_hot, vv, 0.0),
                               axis=0, keepdims=True)
                lfc = (it * kb + j) % NL
                take = best < best_all
                best_all = jnp.where(take, best, best_all)
                tri_all = jnp.where(take, lfc * 8 + jbest, tri_all)
                u_all = jnp.where(take, usel, u_all)
                v_all = jnp.where(take, vsel, v_all)
            has = best_all < MISS
            tb = jnp.where(has, best_all, tb)
            trib = jnp.where(has, tri_all, trib)
            ub = jnp.where(has, u_all, ub)
            vb = jnp.where(has, v_all, vb)
            return (it + 1, tb, trib, ub, vb)

        def mmb_body(c):
            it, tb, trib, ub, vb = c
            w = load_batch(it)
            out = jax.lax.dot_general(
                w, rays_w,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (48*kb, RB*128)
            s = out[0:8]
            for j in range(1, 6 * kb):
                s = s + out[8 * j: 8 * (j + 1)]
            tb = jnp.minimum(tb, jnp.min(s, axis=0, keepdims=True))
            return (it + 1, tb, trib, ub, vb)

        def bat_body(c):
            it, tb, trib, ub, vb = c
            w = load_batch(it)
            out = jax.lax.dot_general(
                w, rays_w,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (48*kb, RB*128)
            # per-leaf epilogue against the SHARED (stale) tb — the
            # deferred-drain semantics; batch-level winner update
            best_all = jnp.full((1, RB * 128), BIG)
            tri_all = jnp.full((1, RB * 128), -1, jnp.int32)
            u_all = big_w * 0
            v_all = big_w * 0
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
                      & (tt > TNEAR) & (tt < tb))
                ttm = jnp.where(ok, tt, BIG)
                best = jnp.min(ttm, axis=0, keepdims=True)
                jbest = jnp.min(jnp.where(ttm <= best, jrow, 8),
                                axis=0, keepdims=True)
                one_hot = jrow == jbest
                usel = jnp.sum(jnp.where(one_hot, uu, 0.0),
                               axis=0, keepdims=True)
                vsel = jnp.sum(jnp.where(one_hot, vv, 0.0),
                               axis=0, keepdims=True)
                lfc = (it * kb + j) % NL
                take = best < best_all
                best_all = jnp.where(take, best, best_all)
                tri_all = jnp.where(take, lfc * 8 + jbest, tri_all)
                u_all = jnp.where(take, usel, u_all)
                v_all = jnp.where(take, vsel, v_all)
            # every ok already required tt < (stale) tb, so any
            # non-BIG best_all improves tb
            has = best_all < MISS
            tb = jnp.where(has, best_all, tb)
            trib = jnp.where(has, tri_all, trib)
            ub = jnp.where(has, u_all, ub)
            vb = jnp.where(has, v_all, vb)
            return (it + 1, tb, trib, ub, vb)

        def cb_body(c):
            """Compact layout: one dot [8, 24*kb] x [8, 2*RB*128] ->
            (24*kb, 2*RB*128); cols = component-major per leaf
            (u-functionals of 8 tris, then v, then z); N = o-half |
            d-half (ray row 3 = 1 for o, 0 for d, so the translation
            rides the dot)."""
            it, tb, trib, ub, vb = c
            w = load_batch_compact(it)
            out = jax.lax.dot_general(
                w, rays2, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            NW = RB * 128
            best_all = jnp.full((1, NW), BIG)
            tri_all = jnp.full((1, NW), -1, jnp.int32)
            u_all = big_w * 0
            v_all = big_w * 0
            for j in range(kb):
                o = 24 * j
                ou = out[o + 0: o + 8, 0:NW]
                ov = out[o + 8: o + 16, 0:NW]
                oz = out[o + 16: o + 24, 0:NW]
                du = out[o + 0: o + 8, NW:]
                dv = out[o + 8: o + 16, NW:]
                dz = out[o + 16: o + 24, NW:]
                neg_inv = jnp.float32(-1.0) / dz
                tt = oz * neg_inv
                uu = ou + tt * du
                vv = ov + tt * dv
                ok = ((uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                      & (tt > TNEAR) & (tt < tb))
                ttm = jnp.where(ok, tt, BIG)
                best = jnp.min(ttm, axis=0, keepdims=True)
                jbest = jnp.min(jnp.where(ttm <= best, jrow, 8),
                                axis=0, keepdims=True)
                one_hot = jrow == jbest
                usel = jnp.sum(jnp.where(one_hot, uu, 0.0),
                               axis=0, keepdims=True)
                vsel = jnp.sum(jnp.where(one_hot, vv, 0.0),
                               axis=0, keepdims=True)
                lfc = (it * kb + j) % NL
                take = best < best_all
                best_all = jnp.where(take, best, best_all)
                tri_all = jnp.where(take, lfc * 8 + jbest, tri_all)
                u_all = jnp.where(take, usel, u_all)
                v_all = jnp.where(take, vsel, v_all)
            has = best_all < MISS
            tb = jnp.where(has, best_all, tb)
            trib = jnp.where(has, tri_all, trib)
            ub = jnp.where(has, u_all, ub)
            vb = jnp.where(has, v_all, vb)
            return (it + 1, tb, trib, ub, vb)

        if mode in ("bx3", "bx6"):
            rhi, rmid, rlo = split3(rays_w)
            rays3 = jnp.concatenate([rhi, rmid, rhi], axis=0)
            rays6 = jnp.concatenate([rhi, rmid, rhi, rlo, rmid, rhi],
                                    axis=0)

        if mode in ("cb", "cp"):
            # o|d ray matrix: rows 0-2 = o comps, row 3 = ones/zeros,
            # rows 4-7 = 0; built once (loop-invariant)
            o_half = jnp.concatenate(
                [rays_ref[0:3, :],
                 jnp.ones((1, RB * 128), jnp.float32),
                 jnp.zeros((4, RB * 128), jnp.float32)], axis=0)
            d_half = jnp.concatenate(
                [rays_ref[4:7, :],
                 jnp.zeros((5, RB * 128), jnp.float32)], axis=0)
            rays2 = jnp.concatenate([o_half, d_half], axis=1)

        if mode == "mt":
            body = mt_body
        elif mode == "mmb":
            body = mmb_body
        elif mode == "cb":
            body = cb_body
        elif mode == "cp":
            body = cp_body
        elif mode == "bx3":
            body = lambda c: bx_body(c, 3)
        elif mode == "bx6":
            body = lambda c: bx_body(c, 6)
        else:
            body = bat_body
        it, tb, trib, ub, vb = jax.lax.while_loop(cond, body, carry0)
        acc = tb + trib.astype(jnp.float32) + ub + vb
        out_ref[...] = acc.reshape(RB, 128)
        it_ref[0] = it

    return kernel


@functools.partial(jax.jit, static_argnames=("iters", "mode", "kb"))
def run(wtiles, ltiles, rays, iters, mode, kb):
    return pl.pallas_call(
        make_kernel(iters, mode, kb),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((RB, 128), jnp.float32),
                   jax.ShapeDtypeStruct((1,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(wtiles, ltiles, rays)


def main():
    specs = []
    for a in (sys.argv[1:] or
              ["mt", "bat2", "bat4", "bat8", "bat16",
               "mmb1", "mmb4", "mmb8", "mmb16"]):
        if a == "mt":
            specs.append(("mt", 1))
        elif a.startswith("mmb"):
            specs.append(("mmb", int(a[3:])))
        elif a.startswith("cb"):
            specs.append(("cb", int(a[2:])))
        elif a.startswith("cp"):
            specs.append(("cp", int(a[2:])))
        elif a.startswith("bx3_"):
            specs.append(("bx3", int(a[4:])))
        elif a.startswith("bx6_"):
            specs.append(("bx6", int(a[4:])))
        elif a.startswith("bat"):
            specs.append(("bat", int(a[3:])))
    rng = np.random.RandomState(7)
    wt = [jnp.asarray(rng.randn(NL, 8, 128).astype(np.float32))
          for _ in range(6)]
    lt = [jnp.asarray(rng.rand(NL // 8, 8, 128).astype(np.float32))
          for _ in range(6)]
    rays = jnp.asarray(rng.randn(8, RB * 128).astype(np.float32))
    VISITS_LO, VISITS_HI = 8192, 262144
    res_by = {}
    for mode, kb in specs:
        res = {}
        for visits in (VISITS_LO, VISITS_HI):
            iters = visits // kb
            a, itv = run(wt[5], lt[5], rays, iters, mode, kb)
            assert int(np.asarray(itv)[0]) == iters, "early exit!"
            ts = []
            for i in range(5):
                t0 = time.perf_counter()
                a, _ = run(wt[i], lt[i], rays, iters, mode, kb)
                _ = np.asarray(a)
                ts.append(time.perf_counter() - t0)
            res[visits] = min(ts)
        slope = (res[VISITS_HI] - res[VISITS_LO]) / (
            VISITS_HI - VISITS_LO)
        name = f"{mode}{kb}" if mode != "mt" else "mt"
        res_by[name] = slope
        print(f"{name:7s}: {slope*1e9:7.1f} ns/leaf-visit "
              f"(~{slope*940e6:6.0f} cyc, batch {kb})  "
              f"(raw {res[VISITS_LO]*1e3:.1f} / "
              f"{res[VISITS_HI]*1e3:.1f} ms)")
    if "mt" in res_by:
        mt = res_by["mt"]
        for m, s in res_by.items():
            if m != "mt":
                print(f"  {m}: {100*(mt-s)/mt:+.1f}% vs mt/visit")


if __name__ == "__main__":
    main()
