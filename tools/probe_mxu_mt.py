#!/usr/bin/env python
"""Probe the MXU for the leaf Moller-Trumbore block (round-4 #1).

The v5 kernel's leaf drain is the declared issue bottleneck (~75% of
kernel vector issue, PLAN_TPU round-3 facts) and is dot-product-shaped
math. The MXU has never been tried. Candidate: precompute per triangle
the Woop affine world->unit-triangle transform M (rows of the inverse
of [e1 e2 n], translation -M v0). Then for a leaf of 8 triangles one
dot_general

    W [8 comps (ox,oy,oz,1,dx,dy,dz,0), 48 outs (6 per tri,
       component-major: o'x(8 tris), o'y, o'z, d'x, d'y, d'z)]
    contracted dim0-dim0 with
    RAYS [8 comps, 1024 rays]  ->  out [48, 1024]

computes every (tri, ray) transformed origin/direction; the epilogue
is t = -o'z/d'z, u = o'x + t d'x, v = o'y + t d'y plus the hit tests
and winner select — ~31 (8,1024)-class ops vs the current ~70
(8,128)-ops x 8 rows (~560 unit-ops) pure-VPU block.

Modes (fixed trip count, verified; np.asarray fence; slope method per
tools/probe_visit_cost.py — fixed call cost cancels):
  mt        current 9-gather + 8-row MT block (baseline; probe_div_cost
            'div' reproduced ~232 cyc/visit round 3)
  mm        the dynamic woop-tile load + dot_general alone (matmul cost
            floor, trivial consume)
  mxu       full MXU block: load + matmul + epilogue incl. u/v winner
            one-hot selection (kernel-parity output)
  mxu_nouv  MXU block WITHOUT u/v winner selection (t/tri only): the
            'defer u/v to shade' variant — u/v recomputed per winning
            triangle at shade time from the same woop rows
  mxu8      per-ray-row variant: 8 matmuls of (8,48)x(8,128) (checks
            whether the (48,1024) register/spill footprint of the wide
            matmul hurts)

Also runs a numpy cross-check first: woop-form t/u/v equals classic MT
t/u/v to float tolerance on random triangles (so the timed math is the
real candidate, not a strawman).

Role match: the triangle test inside /root/reference/src/trace_ray.hpp.
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

NL = 256          # woop/leaf tiles resident (like a real ltiles slice)
RB = 8            # ray rows per visit (1024 rays)
EPS = np.float32(1e-9)
TNEAR = np.float32(1e-4)
BIG = np.float32(1e30)
MISS = BIG * np.float32(0.5)


# ---------------------------------------------------------------- woop
def woop_from_tris(v0, e1, e2):
    """Per-tri [8, 6] woop block: rows = (ox,oy,oz,1,dx,dy,dz,0),
    cols = (o'x, o'y, o'z, d'x, d'y, d'z). Degenerate tris produce a
    no-hit block (o'z forced huge)."""
    n = np.cross(e1, e2)
    T = v0.shape[0]
    A = np.stack([e1, e2, n], axis=2)           # [T,3,3] columns
    det = np.linalg.det(A)
    bad = np.abs(det) < 1e-30
    A[bad] = np.eye(3)
    M = np.linalg.inv(A)                        # rows: u,v,z functionals
    W = np.zeros((T, 8, 6), np.float32)
    for c in range(3):                          # o' cols: affine
        W[:, 0:3, c] = M[:, c, :]
        W[:, 3, c] = -np.einsum("tj,tj->t", M[:, c, :], v0)
        W[:, 4:7, 3 + c] = M[:, c, :]           # d' cols: linear
    # unit-triangle frame: o'x=u-part etc. Swap so cols 0,1 are u,v
    # functionals and col 2 the plane coord (already: M rows are u,v,z)
    W[bad, 3, 2] = 1e30                         # o'z huge -> never hits
    W[bad, 4:7, 5] = 0.0                        # d'z = 0
    return W


def np_woop_tuv(W, o, d):
    """Reference evaluation of the woop block on rays [R,3]."""
    f = np.concatenate([o, np.ones((o.shape[0], 1), np.float32),
                        d, np.zeros((o.shape[0], 1), np.float32)],
                       axis=1)                   # [R,8]
    out = f @ W                                  # [R,6] per tri
    opx, opy, opz = out[:, 0], out[:, 1], out[:, 2]
    dpx, dpy, dpz = out[:, 3], out[:, 4], out[:, 5]
    with np.errstate(divide="ignore", invalid="ignore"):
        t = -opz / dpz
        u = opx + t * dpx
        v = opy + t * dpy
    return t, u, v


def np_mt_tuv(v0, e1, e2, o, d):
    p = np.cross(d, e2[None])                    # [R,3]
    det = np.einsum("j,rj->r", e1, p)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = 1.0 / det
        tv = o - v0[None]
        u = np.einsum("rj,rj->r", tv, p) * inv
        q = np.cross(tv, e1[None])
        v = np.einsum("rj,rj->r", q, d) * inv
        t = np.einsum("rj,j->r", q, e2) * inv
    return t, u, v


def crosscheck():
    rng = np.random.RandomState(3)
    T, R = 64, 256
    v0 = rng.randn(T, 3).astype(np.float32)
    e1 = rng.randn(T, 3).astype(np.float32)
    e2 = rng.randn(T, 3).astype(np.float32)
    W = woop_from_tris(v0, e1, e2)
    o = rng.randn(R, 3).astype(np.float32)
    d = rng.randn(R, 3).astype(np.float32)
    worst = 0.0
    for ti in range(T):
        tw, uw, vw = np_woop_tuv(W[ti], o, d)
        tm, um, vm = np_mt_tuv(v0[ti], e1[ti], e2[ti], o, d)
        sel = np.isfinite(tm) & (np.abs(tm) < 1e3)
        rel = np.max(np.abs(tw[sel] - tm[sel])
                     / np.maximum(1.0, np.abs(tm[sel])))
        relu = np.max(np.abs(uw[sel] - um[sel])
                      / np.maximum(1.0, np.abs(um[sel])))
        relv = np.max(np.abs(vw[sel] - vm[sel])
                      / np.maximum(1.0, np.abs(vm[sel])))
        worst = max(worst, rel, relu, relv)
    print(f"numpy woop-vs-MT crosscheck: worst rel err {worst:.2e}")
    assert worst < 5e-4, "woop algebra does not match MT"


# ------------------------------------------------------------- kernels
def bg(tile, lane, n=8):
    idx = jnp.full((n, 128), lane, jnp.int32)
    return jnp.take_along_axis(tile, idx, axis=1)


def make_kernel(iters, mode):
    def kernel(wtiles_ref, ltiles_ref, rays_ref, out_ref, it_ref):
        jrow = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        jrow_w = jax.lax.broadcasted_iota(jnp.int32, (8, RB * 128), 0)
        if mode == "mmk128":
            # K padded 8 -> 128 (rays replicated 16x in sublanes):
            # distinguishes "small-K dot is VPU-lowered" from "matmul
            # fixed cost" — same useful work, full-K MXU shape
            rays_k128 = jnp.concatenate([rays_ref[:, :]] * 16, axis=0)

        # per-row views (mt mode)
        ox = [rays_ref[0:1, i * 128:(i + 1) * 128] for i in range(RB)]
        oy = [rays_ref[1:2, i * 128:(i + 1) * 128] for i in range(RB)]
        oz = [rays_ref[2:3, i * 128:(i + 1) * 128] for i in range(RB)]
        dx = [rays_ref[4:5, i * 128:(i + 1) * 128] for i in range(RB)]
        dy = [rays_ref[5:6, i * 128:(i + 1) * 128] for i in range(RB)]
        dz = [rays_ref[6:7, i * 128:(i + 1) * 128] for i in range(RB)]
        rays_w = rays_ref[:, :]                  # (8, RB*128)

        big_w = jnp.full((1, RB * 128), BIG)
        carry0 = (jnp.int32(0), big_w,
                  jnp.full((1, RB * 128), -1, jnp.int32),
                  big_w * 0, big_w * 0)

        def cond(c):
            return c[0] < iters

        def mt_body(c):
            it, tb, trib, ub, vb = c
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
                jbest = jnp.min(jnp.where(ttm <= best, jrow, 8),
                                axis=0, keepdims=True)
                one_hot = jrow == jbest
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

        def mmk128_body(c):
            it, tb, trib, ub, vb = c
            lfc = it % NL
            wtile = wtiles_ref[lfc]
            w128 = jnp.concatenate([wtile[:, 0:48]] * 16, axis=0)
            out = jax.lax.dot_general(
                w128, rays_k128,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)   # (48, RB*128)
            s = (out[0:8] + out[8:16] + out[16:24]
                 + out[24:32] + out[32:40] + out[40:48])
            tb = jnp.minimum(tb, jnp.min(s, axis=0, keepdims=True))
            return (it + 1, tb, trib, ub, vb)

        def mxu_body(c):
            it, tb, trib, ub, vb = c
            lfc = it % NL
            wtile = wtiles_ref[lfc]              # (8, 128), 48 used
            out = jax.lax.dot_general(
                wtile[:, 0:48], rays_w,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)   # (48, RB*128)
            if mode == "mm":
                s = (out[0:8] + out[8:16] + out[16:24]
                     + out[24:32] + out[32:40] + out[40:48])
                tb = jnp.minimum(tb, jnp.min(s, axis=0, keepdims=True))
                return (it + 1, tb, trib, ub, vb)
            opx = out[0:8]
            opy = out[8:16]
            opz = out[16:24]
            dpx = out[24:32]
            dpy = out[32:40]
            dpz = out[40:48]
            neg_inv = jnp.float32(-1.0) / dpz
            tt = opz * neg_inv
            uu = opx + tt * dpx
            vv = opy + tt * dpy
            ok = ((uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                  & (tt > TNEAR) & (tt < tb))
            ttm = jnp.where(ok, tt, BIG)
            best = jnp.min(ttm, axis=0, keepdims=True)
            has = best < MISS
            jbest = jnp.min(jnp.where(ttm <= best, jrow_w, 8),
                            axis=0, keepdims=True)
            tb = jnp.where(has, best, tb)
            trib = jnp.where(has, lfc * 8 + jbest, trib)
            if mode == "mxu":
                one_hot = jrow_w == jbest
                usel = jnp.sum(jnp.where(one_hot, uu, 0.0),
                               axis=0, keepdims=True)
                vsel = jnp.sum(jnp.where(one_hot, vv, 0.0),
                               axis=0, keepdims=True)
                ub = jnp.where(has, usel, ub)
                vb = jnp.where(has, vsel, vb)
            return (it + 1, tb, trib, ub, vb)

        def mxu8_body(c):
            it, tb, trib, ub, vb = c
            lfc = it % NL
            wtile = wtiles_ref[lfc]
            tb_n, trib_n = [], []
            for i in range(RB):
                sl = slice(i * 128, (i + 1) * 128)
                out = jax.lax.dot_general(
                    wtile[:, 0:48], rays_w[:, sl],
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (48,128)
                opx, opy, opz = out[0:8], out[8:16], out[16:24]
                dpx, dpy, dpz = out[24:32], out[32:40], out[40:48]
                neg_inv = jnp.float32(-1.0) / dpz
                tt = opz * neg_inv
                uu = opx + tt * dpx
                vv = opy + tt * dpy
                t_i = tb[:, sl]
                ok = ((uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                      & (tt > TNEAR) & (tt < t_i))
                ttm = jnp.where(ok, tt, BIG)
                best = jnp.min(ttm, axis=0, keepdims=True)
                has = best < MISS
                jbest = jnp.min(jnp.where(ttm <= best, jrow, 8),
                                axis=0, keepdims=True)
                tb_n.append(jnp.where(has, best, t_i))
                trib_n.append(jnp.where(has, lfc * 8 + jbest,
                                        trib[:, sl]))
            return (it + 1, jnp.concatenate(tb_n, axis=1),
                    jnp.concatenate(trib_n, axis=1), ub, vb)

        body = {"mt": mt_body, "mm": mxu_body, "mxu": mxu_body,
                "mxu_nouv": mxu_body, "mxu8": mxu8_body,
                "mmk128": mmk128_body}[mode]
        it, tb, trib, ub, vb = jax.lax.while_loop(cond, body, carry0)
        acc = tb + trib.astype(jnp.float32) + ub + vb
        out_ref[...] = acc.reshape(RB, 128)
        it_ref[0] = it

    return kernel


@functools.partial(jax.jit, static_argnames=("iters", "mode"))
def run(wtiles, ltiles, rays, iters, mode):
    return pl.pallas_call(
        make_kernel(iters, mode),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((RB, 128), jnp.float32),
                   jax.ShapeDtypeStruct((1,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(wtiles, ltiles, rays)


def main():
    crosscheck()
    modes = sys.argv[1:] or ["mt", "mm", "mxu", "mxu_nouv", "mxu8"]
    rng = np.random.RandomState(7)
    wt = [jnp.asarray(rng.randn(NL, 8, 128).astype(np.float32))
          for _ in range(6)]
    lt = [jnp.asarray(rng.rand(NL // 8, 8, 128).astype(np.float32))
          for _ in range(6)]
    rays = jnp.asarray(rng.randn(8, RB * 128).astype(np.float32))
    LO, HI = 8192, 65536
    base = {}
    for mode in modes:
        res = {}
        for iters in (LO, HI):
            a, itv = run(wt[5], lt[5], rays, iters, mode)
            assert int(np.asarray(itv)[0]) == iters, "early exit!"
            ts = []
            for i in range(5):
                t0 = time.perf_counter()
                a, _ = run(wt[i], lt[i], rays, iters, mode)
                _ = np.asarray(a)
                ts.append(time.perf_counter() - t0)
            res[iters] = min(ts)
        slope = (res[HI] - res[LO]) / (HI - LO)
        base[mode] = slope
        print(f"{mode:8s}: {slope*1e9:7.1f} ns/leaf-visit "
              f"(~{slope*940e6:6.0f} cyc, {RB} rows)  "
              f"(raw {res[LO]*1e3:.1f} / {res[HI]*1e3:.1f} ms)")
    if "mt" in base:
        for m, s in base.items():
            if m != "mt":
                print(f"  {m}: {100*(base['mt']-s)/base['mt']:+.1f}% "
                      f"vs mt")


if __name__ == "__main__":
    main()
