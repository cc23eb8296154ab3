"""Pallas packet traversal v2: sublane-major tiles, children x rays.

Replaces the v1 kernel's per-visit economics (ops/traverse_pallas.py:
~48-72 scalar VMEM loads + per-child sequential slab tests on
(ROWS,128) registers, ~1000 cycles/visit) with a layout measured on
v5e (tools/probe_mosaic.py) to support:

  - ONE dynamic-row vector load of a (8,128) tile per visited node
    (children tiles pack 16 nodes; leaf tiles pack 8 leaves),
  - lane-broadcast in-register gathers (take_along_axis axis=1 with a
    runtime-uniform index) to expand each box/triangle component into
    an (8,128) register: sublane j = child/triangle j, all 128 lanes =
    that component broadcast,
  - slab tests for ALL 8 children x 128 rays in ~20 (8,128) VPU ops
    (vs 8 sequential per-child tests), and Moller-Trumbore for ALL 8
    leaf triangles x 128 rays in ~45 ops.

Packets are RB x 128 rays (RB = SRT_PACKET_ROWS2, default 2): small
packets keep the union of per-ray visit sets tight on incoherent
bounce rays (the round-1 bottleneck, PLAN_TPU.md), and the per-visit
cost they no longer amortize is gone.

Children are pushed far-to-near by PACKET-MIN SLAB DISTANCE (an
8-way scalar ranking chain), which both orders better than the v1
octant rank and frees the kernel from the implicit heap: child ids are
READ FROM THE TILE (lane 8g+6), so an explicit-pointer (SAH) tree
drops in without kernel changes.

Physical VMEM cost of the tiles equals the v1 row tables (whose 48/72
-wide rows already padded to 128 lanes). Same fill-the-role citation
as v1: this is the reference's rtcIntersect1 (trace_ray.hpp:22).
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

# Ray rows per sub-packet: sub-packet = RB x 128 rays sharing one
# traversal stack. Smaller RB = tighter visit unions; larger RB
# amortizes the per-visit fixed cost (the scalar-unit side: rank
# chain, scratch extraction, stack ops — measured as the critical
# path, tools/ablate_kernel.py). Measured on v5e sponza_proc SAH:
# rb4 99 / rb8 107 ms per 1M primaries; rb4 264 / rb8 250 ms per 1M
# sorted diffuse bounce rays — 8 wins on the dominant bounce load.
PACKET_ROWS2 = int(os.environ.get("SRT_PACKET_ROWS2", "8"))
_STACK = 192  # >= depth*7 + 1 for any tree that fits VMEM, plus slack
_MISS = np.float32(BIG) * np.float32(0.5)  # "no hit" threshold for keys


def _bcast_gather(tile, lane, n=8):
    """(8,128) register whose sublane j = tile[j, lane], broadcast over
    all 128 lanes (lane is a runtime scalar)."""
    idx = jnp.full((n, 128), lane, jnp.int32)
    return jnp.take_along_axis(tile, idx, axis=1)


def _packet_kernel2(ctiles_ref, ltiles_ref,
                    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                    act_ref,
                    t_ref, tri_ref, u_ref, v_ref,
                    stack_ref, keybuf_ref, idbuf_ref,
                    *, ni: int, k: int, rb: int, stats_ref=None):
    # Pallas block shapes need >= 8 sublanes, so each program owns an
    # (8,128) ray block and runs 8/rb INDEPENDENT sub-packet traversals
    # sequentially — sub-packets of rb rows keep the visit unions tight
    # while the block spec stays legal.
    for s in range(8 // rb):
        _traverse_subpacket(
            ctiles_ref, ltiles_ref, ox_ref, oy_ref, oz_ref,
            dx_ref, dy_ref, dz_ref, act_ref,
            t_ref, tri_ref, u_ref, v_ref,
            stack_ref, keybuf_ref, idbuf_ref,
            ni=ni, k=k, rb=rb, row0=s * rb, stats_ref=stats_ref)


def _traverse_subpacket(ctiles_ref, ltiles_ref,
                        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                        act_ref,
                        t_ref, tri_ref, u_ref, v_ref,
                        stack_ref, keybuf_ref, idbuf_ref,
                        *, ni: int, k: int, rb: int, row0: int,
                        stats_ref=None):
    # per-row (1,128) ray registers (loop-invariant)
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

    # Inactive lanes: t_best = -BIG, so no slab test (tmin < t_best)
    # or MT test (tt < t_best) can ever pass — they contribute nothing
    # to the packet's union visit set (ADVICE round 1: the v1 kernel's
    # t_best = 0 still passed for origins inside a box).
    t0 = [jnp.where(a, jnp.float32(BIG), jnp.float32(-BIG)) for a in act]
    trim1 = [jnp.full((1, 128), -1, jnp.int32) for _ in range(rb)]
    zero = [jnp.zeros((1, 128), jnp.float32) for _ in range(rb)]

    stack_ref[0] = 0  # root
    carry0 = (jnp.int32(1), tuple(t0), tuple(trim1), tuple(zero),
              tuple(zero), jnp.int32(0), jnp.int32(0))

    jrow = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)

    def cond(c):
        return c[0] > 0

    def body(c):
        sp, t_best, tri_best, ub, vb, vi, vl = c
        node = stack_ref[sp - 1]
        sp = sp - 1
        is_leaf = node >= ni

        def leaf_case(args):
            sp, t_best, tri_best, ub, vb = args
            leaf = node - ni
            tile = ltiles_ref[jnp.minimum(leaf // 8,
                                          ltiles_ref.shape[0] - 1)]
            base = 16 * (leaf % 8)
            v0x = _bcast_gather(tile, base + 0)
            v0y = _bcast_gather(tile, base + 1)
            v0z = _bcast_gather(tile, base + 2)
            e1x = _bcast_gather(tile, base + 3)
            e1y = _bcast_gather(tile, base + 4)
            e1z = _bcast_gather(tile, base + 5)
            e2x = _bcast_gather(tile, base + 6)
            e2y = _bcast_gather(tile, base + 7)
            e2z = _bcast_gather(tile, base + 8)

            t_new, tri_new, u_new, v_new = [], [], [], []
            for r in range(rb):
                # MT for 8 triangles (sublanes) x 128 rays (lanes)
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
                best = jnp.min(ttm, axis=0, keepdims=True)   # (1,128)
                has = best < _MISS
                jbest = jnp.min(jnp.where(ttm <= best, jrow, 8),
                                axis=0, keepdims=True)
                one_hot = jrow == jbest
                usel = jnp.sum(jnp.where(one_hot, uu, 0.0),
                               axis=0, keepdims=True)
                vsel = jnp.sum(jnp.where(one_hot, vv, 0.0),
                               axis=0, keepdims=True)
                t_new.append(jnp.where(has, best, t_best[r]))
                tri_new.append(jnp.where(has, leaf * k + jbest,
                                         tri_best[r]))
                u_new.append(jnp.where(has, usel, ub[r]))
                v_new.append(jnp.where(has, vsel, vb[r]))
            return (sp, tuple(t_new), tuple(tri_new), tuple(u_new),
                    tuple(v_new))

        def internal_case(args):
            sp, t_best, tri_best, ub, vb = args
            nd = jnp.minimum(node, ni - 1)
            tile = ctiles_ref[nd // 16]
            base = 8 * (nd % 16)
            lox = _bcast_gather(tile, base + 0)
            loy = _bcast_gather(tile, base + 1)
            loz = _bcast_gather(tile, base + 2)
            hix = _bcast_gather(tile, base + 3)
            hiy = _bcast_gather(tile, base + 4)
            hiz = _bcast_gather(tile, base + 5)

            key_acc = jnp.full((8, 128), jnp.float32(BIG))
            for r in range(rb):
                t1x = (lox - ox[r]) * ix[r]
                t2x = (hix - ox[r]) * ix[r]
                t1y = (loy - oy[r]) * iy[r]
                t2y = (hiy - oy[r]) * iy[r]
                t1z = (loz - oz[r]) * iz[r]
                t2z = (hiz - oz[r]) * iz[r]
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
                key_acc = jnp.minimum(
                    key_acc, jnp.where(hit, tmin, jnp.float32(BIG)))

            # packet-min slab distance per child -> scalars via scratch
            key = jnp.min(key_acc, axis=1, keepdims=True)     # (8,1)
            keybuf_ref[:] = jnp.broadcast_to(key, (8, 128))
            idbuf_ref[:] = _bcast_gather(tile, base + 6)

            keys = [keybuf_ref[j, 0] for j in range(8)]
            hits = [(keys[j] < _MISS).astype(jnp.int32) for j in range(8)]

            # Push far-to-near: child j's slot skips every hit child
            # that is FARTHER (greater key; ties broken by index), so
            # the nearest child lands on top of the stack.
            for j in range(8):
                ahead = jnp.int32(0)
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

        out = jax.lax.cond(is_leaf, leaf_case, internal_case,
                           (sp, t_best, tri_best, ub, vb))
        vi = vi + jnp.where(is_leaf, 0, 1)
        vl = vl + jnp.where(is_leaf, 1, 0)
        return out + (vi, vl)

    (_, t_best, tri_best, ub, vb, vi, vl) = jax.lax.while_loop(
        cond, body, carry0)
    if stats_ref is not None:
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        stats_ref[row0:row0 + 1, :] = jnp.where(
            lane == 0, vi, jnp.where(lane == 1, vl, 0))
    for i, r in enumerate(rows):
        # inactive lanes report the v1-compatible (t=0, tri=-1)
        t_ref[r:r + 1, :] = jnp.where(act[i], t_best[i], 0.0)
        tri_ref[r:r + 1, :] = jnp.where(act[i], tri_best[i], -1)
        u_ref[r:r + 1, :] = ub[i]
        v_ref[r:r + 1, :] = vb[i]


@functools.partial(jax.jit,
                   static_argnames=("ni", "leaf_size", "rows", "stats"))
def traverse_packets2(ctiles: jnp.ndarray, ltiles: jnp.ndarray,
                      ni: int, leaf_size: int, o: V3, d: V3,
                      active: jnp.ndarray | None = None,
                      rows: int | None = None,
                      stats: bool = False) -> Hit:
    """Packetized closest-hit traversal over tile tables (see
    wbvh.pack_tiles_np). o/d: V3 of [R]; R padded internally to a
    packet multiple. Returns Hit like traverse_packets/traverse8."""
    rb = rows or PACKET_ROWS2
    if rb not in (1, 2, 4, 8):
        raise ValueError("rows must be 1, 2, 4 or 8")
    r = o.x.shape[0]
    pad = (-r) % 1024  # one (8,128) block per program
    rp = r + pad

    def prep(a, fill=0.0):
        if pad:
            a = jnp.concatenate([a, jnp.full((pad,), fill, a.dtype)])
        return a.reshape(rp // 128, 128)

    act = (jnp.ones((r,), jnp.int32) if active is None
           else active.astype(jnp.int32))
    args = (prep(o.x), prep(o.y), prep(o.z),
            prep(d.x), prep(d.y), prep(d.z), prep(act, 0))

    grid = rp // 1024
    ray_spec = pl.BlockSpec((8, 128), lambda g: (g, 0),
                            memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((rp // 128, 128), jnp.float32),
        jax.ShapeDtypeStruct((rp // 128, 128), jnp.int32),
        jax.ShapeDtypeStruct((rp // 128, 128), jnp.float32),
        jax.ShapeDtypeStruct((rp // 128, 128), jnp.float32),
    ]
    out_specs = [ray_spec] * 4
    if stats:
        # per-sub-packet visit counters: block row s*rb carries
        # [internal_visits, leaf_visits] at lanes 0/1
        out_shape.append(
            jax.ShapeDtypeStruct((rp // 128, 128), jnp.int32))
        out_specs.append(ray_spec)

    # refs order: 2 tables + 7 rays + 4 outs [+ stats out] + 3 scratch
    def kernel(ctr, ltr, oxr, oyr, ozr, dxr, dyr, dzr, actr,
               tr, trir, ur, vr, *rest):
        if stats:
            statsr, stackr, keyr, idr = rest
        else:
            stackr, keyr, idr = rest
            statsr = None
        _packet_kernel2(ctr, ltr, oxr, oyr, ozr, dxr, dyr, dzr, actr,
                        tr, trir, ur, vr, stackr, keyr, idr,
                        ni=ni, k=leaf_size, rb=rb, stats_ref=statsr)

    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
        + [ray_spec] * 7,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((_STACK,), jnp.int32),
                        pltpu.VMEM((8, 128), jnp.float32),
                        pltpu.VMEM((8, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(ctiles, ltiles, *args)
    t, tri, u, v = outs[:4]

    flat = lambda a: a.reshape(rp)[:r]
    hit = Hit(t=flat(t), tri=flat(tri), u=flat(u), v=flat(v))
    if stats:
        return hit, outs[4]
    return hit
