#!/usr/bin/env python
"""Measure the marginal cost of the per-row (8,128) f32 divide in the
leaf Moller-Trumbore block (PLAN_TPU roadmap #2: division-free MT).

The real kernel (ops/traverse_pallas5.py leaf phase) pays, per
(leaf, ray-row): 9 broadcast-gathers amortized over rb rows, then per
row ~55 vector ops on (8,128) including ONE divide (inv_det). A
division-free formulation (multiply the u/v/t tests through by det and
det^2) would remove the divide and the 3 inv_det scalings but add ~8
mul/cmp ops, PLUS a cross-row cross-multiply tournament to pick the
winning triangle without normalizing (the sublane min-reduce needs
comparable values). Whether any of that pays depends entirely on what
the divide actually costs relative to mul on this VPU — measured here,
not guessed.

Modes (identical loop/gather/store structure, fixed trip count,
data-independent control flow so wrong math cannot change timing):
  div    the real formulation: where(|det|>eps, 1/det, 0) + 3 scalings
  nodiv  inv_det -> det * 0.5 (wrong math, same op count minus the
         divide): the UPPER BOUND on what any divide removal can save
  dfree  the division-free candidate test (mul-by-det + det^2 compares,
         no divide, no scalings) + cross-mul tournament over sublanes
         via pltpu.roll to extract the winner's (t_num, det): the
         realistic replacement's issue load

Methodology per tools/probe_visit_cost.py: np.asarray fence, verified
trip counts, two iteration counts -> slope (fixed call cost cancels).
"""

import functools
import os
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))

NL = 256          # leaf tiles resident (like a real ltiles slice)
RB = 8            # ray rows per leaf visit, kernel default
EPS = np.float32(1e-9)
TNEAR = np.float32(1e-4)
BIG = np.float32(1e30)


def bg(tile, lane, n=8):
    idx = jnp.full((n, 128), lane, jnp.int32)
    return jnp.take_along_axis(tile, idx, axis=1)


def make_kernel(iters, mode):
    def kernel(ltiles_ref, rays_ref, out_ref, it_ref):
        jrow = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        ox = [rays_ref[i:i + 1, :] for i in range(RB)]
        oy = [rays_ref[RB + i:RB + i + 1, :] for i in range(RB)]
        oz = [rays_ref[2 * RB + i:2 * RB + i + 1, :] for i in range(RB)]
        dx = [rays_ref[3 * RB + i:3 * RB + i + 1, :] for i in range(RB)]
        dy = [rays_ref[4 * RB + i:4 * RB + i + 1, :] for i in range(RB)]
        dz = [rays_ref[5 * RB + i:5 * RB + i + 1, :] for i in range(RB)]

        big = jnp.full((1, 128), BIG)
        carry0 = (jnp.int32(0),
                  tuple(big for _ in range(RB)),
                  tuple(jnp.full((1, 128), -1, jnp.int32)
                        for _ in range(RB)),
                  tuple(jnp.ones((1, 128)) for _ in range(RB)))

        def cond(c):
            return c[0] < iters

        def body(c):
            it, t_best, tri_best, dd_best = c
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
            t_new = list(t_best)
            tri_new = list(tri_best)
            dd_new = list(dd_best)
            for i in range(RB):
                px = dy[i] * e2z - dz[i] * e2y
                py = dz[i] * e2x - dx[i] * e2z
                pz = dx[i] * e2y - dy[i] * e2x
                det = e1x * px + e1y * py + e1z * pz
                tx = ox[i] - v0x
                ty = oy[i] - v0y
                tz = oz[i] - v0z
                un = tx * px + ty * py + tz * pz
                qx = ty * e1z - tz * e1y
                qy = tz * e1x - tx * e1z
                qz = tx * e1y - ty * e1x
                vn = dx[i] * qx + dy[i] * qy + dz[i] * qz
                tn = e2x * qx + e2y * qy + e2z * qz
                if mode in ("div", "nodiv"):
                    if mode == "div":
                        inv_det = jnp.where(jnp.abs(det) > EPS,
                                            1.0 / det, 0.0)
                    else:
                        inv_det = det * 0.5
                    uu = un * inv_det
                    vv = vn * inv_det
                    tt = tn * inv_det
                    ok = ((jnp.abs(det) > EPS)
                          & (uu >= 0.0) & (vv >= 0.0)
                          & (uu + vv <= 1.0)
                          & (tt > TNEAR) & (tt < t_new[i]))
                    ttm = jnp.where(ok, tt, BIG)
                    best = jnp.min(ttm, axis=0, keepdims=True)
                    has = best < BIG * 0.5
                    jbest = jnp.min(jnp.where(ttm <= best, jrow, 8),
                                    axis=0, keepdims=True)
                    t_new[i] = jnp.where(has, best, t_new[i])
                    tri_new[i] = jnp.where(
                        has, lfc * 8 + jbest, tri_new[i])
                else:   # dfree
                    # candidate test multiplied through by det / det^2
                    d2 = det * det
                    ud = un * det
                    vd = vn * det
                    td = tn * det
                    ok = ((d2 > EPS * EPS)
                          & (ud >= 0.0) & (vd >= 0.0)
                          & ((un + vn) * det <= d2)
                          & (td > TNEAR * d2)
                          # candidate-vs-incumbent cross-mul:
                          # td/d2 < tn_best/dd_best
                          & (td * dd_new[i] < t_new[i] * d2))
                    tnc = jnp.where(ok, td, BIG)
                    ddc = jnp.where(ok, d2, jnp.float32(1.0))
                    idx = jrow
                    # cross-mul tournament over sublanes: t1/d1 < t2/d2
                    # <=> t1*d2 < t2*d1 (d>0)
                    for sh in (4, 2, 1):
                        tn_r = pltpu.roll(tnc, sh, 0)
                        dd_r = pltpu.roll(ddc, sh, 0)
                        id_r = pltpu.roll(idx, sh, 0)
                        take = tn_r * ddc < tnc * dd_r
                        tnc = jnp.where(take, tn_r, tnc)
                        ddc = jnp.where(take, dd_r, ddc)
                        idx = jnp.where(take, id_r, idx)
                    tn_w = tnc[0:1, :]
                    dd_w = ddc[0:1, :]
                    has = tn_w < BIG * 0.5
                    # winner vs carried (tn_best, dd_best) cross-mul
                    better = tn_w * dd_new[i] < t_new[i] * dd_w
                    upd = has & better
                    t_new[i] = jnp.where(upd, tn_w, t_new[i])
                    dd_new[i] = jnp.where(upd, dd_w, dd_new[i])
                    tri_new[i] = jnp.where(
                        upd, lfc * 8 + idx[0:1, :], tri_new[i])
            return (it + 1, tuple(t_new), tuple(tri_new),
                    tuple(dd_new))

        it, t_best, tri_best, dd_best = jax.lax.while_loop(
            cond, body, carry0)
        acc = jnp.zeros((1, 128))
        for i in range(RB):
            acc = acc + t_best[i] + tri_best[i].astype(jnp.float32)
            acc = acc + dd_best[i]
        out_ref[...] = jnp.broadcast_to(acc, (8, 128))
        it_ref[0] = it

    return kernel


@functools.partial(jax.jit, static_argnames=("iters", "mode"))
def run(ltiles, rays, iters, mode):
    return pl.pallas_call(
        make_kernel(iters, mode),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((8, 128), jnp.float32),
                   jax.ShapeDtypeStruct((1,), jnp.int32)],
    )(ltiles, rays)


def main():
    rng = np.random.RandomState(7)
    ltile_sets = [jnp.asarray(
        rng.rand(NL // 8, 8, 128).astype(np.float32)) for _ in range(6)]
    rays = jnp.asarray(rng.randn(6 * RB, 128).astype(np.float32))
    LO, HI = 8192, 65536
    base = {}
    for mode in ("div", "nodiv", "dfree"):
        res = {}
        for iters in (LO, HI):
            a, itv = run(ltile_sets[5], rays, iters, mode)
            assert int(np.asarray(itv)[0]) == iters, "early exit!"
            ts = []
            for i in range(5):
                t0 = time.perf_counter()
                a, _ = run(ltile_sets[i], rays, iters, mode)
                _ = np.asarray(a)
                ts.append(time.perf_counter() - t0)
            res[iters] = min(ts)
        slope = (res[HI] - res[LO]) / (HI - LO)
        base[mode] = slope
        print(f"{mode:6s}: {slope*1e9:7.1f} ns/leaf-visit "
              f"(~{slope*940e6:6.0f} cyc, {RB} rows)  "
              f"(raw {res[LO]*1e3:.1f} / {res[HI]*1e3:.1f} ms)")
    d, nd, df = base["div"], base["nodiv"], base["dfree"]
    print(f"divide removal upper bound: {100*(d-nd)/d:.1f}% of the MT "
          f"block; realistic dfree: {100*(d-df)/d:+.1f}%")


if __name__ == "__main__":
    main()
