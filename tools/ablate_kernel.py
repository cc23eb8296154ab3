#!/usr/bin/env python
"""Ablation study of the v2 packet kernel's per-visit cost (real TPU).

Variants (cumulative unless noted):
  full        — the production kernel (traverse_pallas2)
  noleaf      — leaf visits do nothing (isolates internal-node cost)
  nocond      — always run the internal case (cond overhead + both-
                branches test); results are wrong, time is the datum
  bitmask     — hit extraction via one weighted-reduce bitmask scalar
                instead of 8 scratch reads; fixed push order
  noorder     — tmin ordering off (fixed j order), keys never computed

Usage: python tools/ablate_kernel.py [rb]
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))

from sycl_ray_tracer_tpu.ops.intersect import BIG, TNEAR, _DET_EPS
from sycl_ray_tracer_tpu.ops.vec import V3, normalize

_MISS = np.float32(BIG) * np.float32(0.5)
_STACK = 192


def _bg(tile, lane, n=8):
    idx = jnp.full((n, 128), lane, jnp.int32)
    return jnp.take_along_axis(tile, idx, axis=1)


_POSINF = np.float32(np.inf)


def _dead(x):
    """A data-dependent exact-zero (8,128) float: forces the compiler
    to keep the computation of x alive without changing results (no
    finite value exceeds +inf; table entries cap at BIG=3e38)."""
    return jnp.where(x > _POSINF, jnp.float32(1), jnp.float32(0))


def make_kernel(ni, k, rb, mode):
    def sub(ctiles_ref, ltiles_ref, ox_ref, oy_ref, oz_ref,
            dx_ref, dy_ref, dz_ref, act_ref,
            t_ref, tri_ref, u_ref, v_ref,
            stack_ref, keybuf_ref, idbuf_ref, row0):
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
        t0 = [jnp.where(a, jnp.float32(BIG), jnp.float32(-BIG))
              for a in act]
        tm1 = [jnp.full((1, 128), -1, jnp.int32) for _ in range(rb)]
        zz = [jnp.zeros((1, 128), jnp.float32) for _ in range(rb)]
        stack_ref[0] = 0
        carry0 = (jnp.int32(1), tuple(t0), tuple(tm1), tuple(zz),
                  tuple(zz))
        jrow = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        pow2 = jnp.exp2(jrow.astype(jnp.float32))  # 2^j per sublane

        def leaf_case(node, args):
            sp, t_best, tri_best, ub, vb = args
            if mode == "noleaf":
                return args
            leaf = node - ni
            tile = ltiles_ref[jnp.minimum(leaf // 8,
                                          ltiles_ref.shape[0] - 1)]
            base = 16 * (leaf % 8)
            v0x = _bg(tile, base + 0)
            v0y = _bg(tile, base + 1)
            v0z = _bg(tile, base + 2)
            e1x = _bg(tile, base + 3)
            e1y = _bg(tile, base + 4)
            e1z = _bg(tile, base + 5)
            e2x = _bg(tile, base + 6)
            e2y = _bg(tile, base + 7)
            e2z = _bg(tile, base + 8)
            t_new, tri_new, u_new, v_new = [], [], [], []
            for r in range(rb):
                px = dy[r] * e2z - dz[r] * e2y
                py = dz[r] * e2x - dx[r] * e2z
                pz = dx[r] * e2y - dy[r] * e2x
                det = e1x * px + e1y * py + e1z * pz
                inv_det = jnp.where(jnp.abs(det) > _DET_EPS,
                                    1.0 / det, 0.0)
                tx = ox[r] - v0x
                ty = oy[r] - v0y
                tz = oz[r] - v0z
                uu = (tx * px + ty * py + tz * pz) * inv_det
                qx = ty * e1z - tz * e1y
                qy = tz * e1x - tx * e1z
                qz = tx * e1y - ty * e1x
                vv = (dx[r] * qx + dy[r] * qy + dz[r] * qz) * inv_det
                tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                ok = ((jnp.abs(det) > _DET_EPS)
                      & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                      & (tt > TNEAR) & (tt < t_best[r]))
                ttm = jnp.where(ok, tt, jnp.float32(BIG))
                best = jnp.min(ttm, axis=0, keepdims=True)
                has = best < _MISS
                jbest = jnp.min(jnp.where(ttm <= best, jrow, 8),
                                axis=0, keepdims=True)
                oh = jrow == jbest
                usel = jnp.sum(jnp.where(oh, uu, 0.0), 0, keepdims=True)
                vsel = jnp.sum(jnp.where(oh, vv, 0.0), 0, keepdims=True)
                t_new.append(jnp.where(has, best, t_best[r]))
                tri_new.append(jnp.where(has, leaf * k + jbest,
                                         tri_best[r]))
                u_new.append(jnp.where(has, usel, ub[r]))
                v_new.append(jnp.where(has, vsel, vb[r]))
            return (sp, tuple(t_new), tuple(tri_new), tuple(u_new),
                    tuple(v_new))

        def internal_case(node, args, push_ok=None):
            sp, t_best, tri_best, ub, vb = args
            nd = jnp.minimum(node, ni - 1)
            tile = ctiles_ref[nd // 16]
            base = 8 * (nd % 16)
            lox = _bg(tile, base + 0)
            loy = _bg(tile, base + 1)
            loz = _bg(tile, base + 2)
            hix = _bg(tile, base + 3)
            hiy = _bg(tile, base + 4)
            hiz = _bg(tile, base + 5)
            if mode == "x2load":
                tile2 = ctiles_ref[jnp.minimum(
                    nd // 16 + 1, ctiles_ref.shape[0] - 1)]
                lox = lox + _dead(tile2)
            if mode == "x2gather":
                tileb = tile + _dead(tile)  # fresh symbol: defeats CSE
                extra = (_bg(tileb, base + 0) + _bg(tileb, base + 1)
                         + _bg(tileb, base + 2) + _bg(tileb, base + 3)
                         + _bg(tileb, base + 4) + _bg(tileb, base + 5))
                lox = lox + _dead(extra)
            def slab(lx, hx, ly, hy, lz, hz):
                acc = jnp.full((8, 128), jnp.float32(BIG))
                for r in range(rb):
                    t1x = (lx - ox[r]) * ix[r]
                    t2x = (hx - ox[r]) * ix[r]
                    t1y = (ly - oy[r]) * iy[r]
                    t2y = (hy - oy[r]) * iy[r]
                    t1z = (lz - oz[r]) * iz[r]
                    t2z = (hz - oz[r]) * iz[r]
                    tmin = jnp.maximum(
                        jnp.maximum(jnp.minimum(t1x, t2x),
                                    jnp.minimum(t1y, t2y)),
                        jnp.minimum(t1z, t2z))
                    tmax = jnp.minimum(
                        jnp.minimum(jnp.maximum(t1x, t2x),
                                    jnp.maximum(t1y, t2y)),
                        jnp.maximum(t1z, t2z))
                    hit = ((tmax >= jnp.maximum(tmin, TNEAR))
                           & (tmin < t_best[r]))
                    acc = jnp.minimum(
                        acc, jnp.where(hit, tmin, jnp.float32(BIG)))
                return acc

            key_acc = slab(lox, hix, loy, hiy, loz, hiz)
            if mode == "x2slab":
                key2 = slab(lox + _dead(hix), hix, loy, hiy, loz, hiz)
                key_acc = key_acc + _dead(key2)
            if mode == "x2reduce":
                kr = jnp.min(key_acc + _dead(key_acc), axis=1,
                             keepdims=True)
                key_acc = key_acc + _dead(kr)

            idbuf_ref[:] = _bg(tile, base + 6)
            if push_ok is not None:
                key_acc = jnp.where(push_ok, key_acc, jnp.float32(BIG))

            if mode in ("bitmask", "noorder"):
                # per-child any-lane-hit -> one scalar bitmask via a
                # weighted sublane reduce + single scratch roundtrip
                anyv = jnp.max(
                    jnp.where(key_acc < _MISS, 1.0, 0.0),
                    axis=1, keepdims=True)                     # (8,1)
                maskf = jnp.sum(anyv * pow2[:, :1], axis=0,
                                keepdims=True)                 # (1,1)
                keybuf_ref[:] = jnp.broadcast_to(maskf, (8, 128))
                mask = keybuf_ref[0, 0].astype(jnp.int32)
                total = jnp.int32(0)
                for j in range(8):
                    hj = (mask >> j) & 1

                    @pl.when(hj == 1)
                    def _(slot=sp + total, j=j):
                        stack_ref[slot] = idbuf_ref[j, 0].astype(
                            jnp.int32)
                    total = total + hj
                return sp + total, t_best, tri_best, ub, vb

            key = jnp.min(key_acc, axis=1, keepdims=True)
            keybuf_ref[:] = jnp.broadcast_to(key, (8, 128))
            keys = [keybuf_ref[j, 0] for j in range(8)]
            hits = [(keys[j] < _MISS).astype(jnp.int32)
                    for j in range(8)]
            zero_i = jnp.int32(0)
            if mode == "x2extract":
                keys2 = [keybuf_ref[j, 1] for j in range(8)]
                for j in range(8):
                    zero_i = zero_i + (keys2[j] > _POSINF).astype(
                        jnp.int32)
            if mode == "x2chain":
                za = jnp.int32(0)
                for j in range(8):
                    for j2 in range(8):
                        if j2 == j:
                            continue
                        nearer = (keys[j2] < keys[j]) if j2 < j else (
                            keys[j2] <= keys[j])
                        za = za + hits[j2] * nearer.astype(jnp.int32)
                zero_i = zero_i + za * (keys[0] > _POSINF).astype(
                    jnp.int32)
            for j in range(8):
                ahead = zero_i
                for j2 in range(8):
                    if j2 == j:
                        continue
                    farther = (keys[j2] > keys[j]) if j2 < j else (
                        keys[j2] >= keys[j])
                    ahead = ahead + hits[j2] * farther.astype(jnp.int32)

                @pl.when(hits[j] == 1)
                def _(slot=sp + ahead, j=j):
                    stack_ref[slot] = idbuf_ref[j, 0].astype(jnp.int32)
            total = hits[0]
            for j in range(1, 8):
                total = total + hits[j]
            return sp + total, t_best, tri_best, ub, vb

        def cond(c):
            return c[0] > 0

        def body(c):
            sp, t_best, tri_best, ub, vb = c
            node = stack_ref[sp - 1]
            sp = sp - 1
            is_leaf = node >= ni
            args = (sp, t_best, tri_best, ub, vb)
            return jax.lax.cond(
                is_leaf, lambda a: leaf_case(node, a),
                lambda a: internal_case(node, a), args)

        _, t_best, tri_best, ub, vb = jax.lax.while_loop(
            cond, body, carry0)
        for i, r in enumerate(rows):
            t_ref[r:r + 1, :] = jnp.where(act[i], t_best[i], 0.0)
            tri_ref[r:r + 1, :] = jnp.where(act[i], tri_best[i], -1)
            u_ref[r:r + 1, :] = ub[i]
            v_ref[r:r + 1, :] = vb[i]

    def kernel(ctr, ltr, oxr, oyr, ozr, dxr, dyr, dzr, actr,
               tr, trir, ur, vr, stackr, keyr, idr):
        for s in range(8 // rb):
            sub(ctr, ltr, oxr, oyr, ozr, dxr, dyr, dzr, actr,
                tr, trir, ur, vr, stackr, keyr, idr, s * rb)

    return kernel


@functools.partial(jax.jit, static_argnames=("ni", "k", "rb", "mode"))
def run_variant(ctiles, ltiles, ni, k, rb, mode, o, d):
    r = o.x.shape[0]
    rp = r + ((-r) % 1024)
    prep = lambda a: (jnp.concatenate(
        [a, jnp.zeros(((-r) % 1024,), a.dtype)]) if rp != r
        else a).reshape(rp // 128, 128)
    args = (prep(o.x), prep(o.y), prep(o.z),
            prep(d.x), prep(d.y), prep(d.z),
            prep(jnp.ones((r,), jnp.int32)))
    ray_spec = pl.BlockSpec((8, 128), lambda g: (g, 0),
                            memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((rp // 128, 128), t)
                 for t in (jnp.float32, jnp.int32, jnp.float32,
                           jnp.float32)]
    return pl.pallas_call(
        make_kernel(ni, k, rb, mode),
        grid=(rp // 1024,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
        + [ray_spec] * 7,
        out_specs=[ray_spec] * 4,
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((_STACK,), jnp.int32),
                        pltpu.VMEM((8, 128), jnp.float32),
                        pltpu.VMEM((8, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(ctiles, ltiles, *args)


def main():
    from sycl_ray_tracer_tpu.ops import wbvh
    from sycl_ray_tracer_tpu.ops import rng as _rng
    from sycl_ray_tracer_tpu.ops.lbvh import morton30
    from sycl_ray_tracer_tpu.models.camera import (make_camera,
                                                   generate_rays)
    from sycl_ray_tracer_tpu.utils.gltf import load_glb
    from sycl_ray_tracer_tpu.utils.procgen import sponza_like_glb

    rb = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    host = load_glb(sponza_like_glb(scale=2))
    bvh, _, _ = wbvh.build_np(host.tri_v, 8)
    ids = wbvh.heap_child_ids_np(bvh.num_internal)
    ct, lt = wbvh.pack_tiles_np(bvh.children, ids, bvh.leaves, 8)
    ni, k = bvh.num_internal, 8
    ctiles, ltiles = jnp.asarray(ct), jnp.asarray(lt)

    n, res = 1 << 20, 1024
    cam = make_camera(res, res, host.camera_position,
                      host.camera_direction, host.camera_focal_length)
    lane = jnp.arange(n, dtype=jnp.uint32)
    px = (lane % jnp.uint32(res)).astype(jnp.int32)
    py = (lane // jnp.uint32(res)).astype(jnp.int32)

    def prim(seed):
        key = _rng.make_key(jnp.uint32(seed), lane)
        o, d = generate_rays(cam, px, py, key)
        jax.block_until_ready((o.x, d.x))
        return o, d, key

    lo = jnp.asarray(host.tri_v.reshape(-1, 3).min(0))
    hi = jnp.asarray(host.tri_v.reshape(-1, 3).max(0))

    @jax.jit
    def mkbounce(o, d, key, t, tri):
        tt = jnp.where(tri >= 0, t, 1.0)
        new_o = o + d * tt
        u = _rng.uniform3(key, jnp.uint32(77))
        nd = normalize(V3(u[0] * 2 - 1, u[1] * 2 - 1, u[2] * 2 - 1),
                       eps=1e-9)
        oct_ = ((nd.x < 0).astype(jnp.uint32) << 2
                | (nd.y < 0).astype(jnp.uint32) << 1
                | (nd.z < 0).astype(jnp.uint32))
        p = jnp.stack([new_o.x, new_o.y, new_o.z], -1)
        m = morton30(p, lo, hi) >> jnp.uint32(3)
        perm = jnp.argsort((oct_ << jnp.uint32(27)) | m)
        tk = lambda a: jnp.take(a, perm)
        return (V3(tk(new_o.x), tk(new_o.y), tk(new_o.z)),
                V3(tk(nd.x), tk(nd.y), tk(nd.z)))

    workloads = {}
    seeds = list(range(4))
    workloads["primary"] = [prim(s)[:2] for s in seeds]
    bn = []
    for s in seeds:
        o_, d_, k_ = prim(s)
        h = run_variant(ctiles, ltiles, ni, k, rb, "full", o_, d_)
        bn.append(mkbounce(o_, d_, k_,
                           h[0].reshape(-1)[:n], h[1].reshape(-1)[:n]))
    jax.block_until_ready(bn)
    workloads["bounce"] = bn

    for wname, sets in workloads.items():
        for mode in ("full", "noleaf", "bitmask", "x2load", "x2gather",
                     "x2slab", "x2reduce", "x2extract", "x2chain"):
            # warm
            out = run_variant(ctiles, ltiles, ni, k, rb, mode, *sets[0])
            jax.block_until_ready(out)
            ts = []
            for i in (1, 2, 3):
                t0 = time.perf_counter()
                out = run_variant(ctiles, ltiles, ni, k, rb, mode,
                                  *sets[i])
                jax.block_until_ready(out)
                ts.append(time.perf_counter() - t0)
            dt = min(ts)
            print(f"{wname:8s} rb{rb} {mode:8s}: {dt*1e3:8.1f} ms  "
                  f"{n/dt/1e6:6.2f} Mrays/s")


if __name__ == "__main__":
    main()
