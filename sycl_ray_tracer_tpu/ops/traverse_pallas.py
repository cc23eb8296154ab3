"""Pallas packet traversal: the TPU-native BVH inner loop.

Why a kernel: XLA-level traversal pays a per-step toll of HBM gathers
and kernel-boundary materializations (measured ~20 ms per step at 1M
lanes). The TPU's fast paths are (a) VMEM (~20x HBM bandwidth) and
(b) dense (8, 128) register ops. Per-lane HBM gather hardware does not
exist, and Mosaic's in-register gather only shuffles within 128 lanes —
so per-ray divergent traversal is off the table. What IS native:

  PACKET traversal. 2048 rays = one (16, 128) register set. The packet
  walks the WBVH8 (ops/wbvh.py) with a single shared scalar stack in
  SMEM; every visited node is one scalar-indexed VMEM row read whose
  8 child slab tests and K triangle tests run densely over the whole
  packet at full VPU width. A node is visited if ANY ray in the packet
  wants it (vector -> scalar reduction), so packet cost is the UNION
  of member rays' visit sets — near-1x for coherent camera packets,
  degrading gracefully for incoherent bounce packets.

Children are pushed far-to-near using the packet's dominant octant
(child-index bits ARE octant bits in the WBVH8, see ops/wbvh.py), so
LIFO pops visit front-to-back and t_best culls most of the far set.

The scene's split tables (children [NI, 48] + real leaves
[ceil(N/K), 9K]) must fit in VMEM — up to ~1.1M triangles at K=8
given the measured ~50-64 MB compile ceiling; larger scenes fall back
to the XLA traversal.

This fills the role of the reference's rtcIntersect1 (trace_ray.hpp:22):
one intersector under both renderers.
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

import os

# Rays per packet: one (ROWS, 128) register set. Bigger packets
# amortize per-visit scalar overhead; smaller packets shrink the
# union of per-ray visit sets. The optimum grows with the sorted-pool
# size: measured on v5e sponza_proc 1024x1024 spp8 with 8M-ray waves,
# 16 rows 1.24 / 32 rows 1.34 Mrays/s (at 1M-ray waves 16 rows won).
# Must be a multiple of 8 (f32 sublane tile). Override with
# SRT_PACKET_ROWS for experiments.
PACKET_ROWS = int(os.environ.get("SRT_PACKET_ROWS", "32"))
PACKET = PACKET_ROWS * 128
_STACK = 128           # shared stack slots (worst case depth*7 + slack)


def _packet_kernel(children_ref, leaves_ref,
                   ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                   act_ref,
                   t_ref, tri_ref, u_ref, v_ref,
                   stack_ref, *, ni: int, k: int):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    active = act_ref[:] != 0

    inv = lambda a: jnp.where(jnp.abs(a) > 1e-20, 1.0 / a,
                              jnp.float32(1e20))
    ix, iy, iz = inv(dx), inv(dy), inv(dz)

    # Packet-dominant octant (scalar): majority direction sign per axis.
    flt = active.astype(jnp.float32)
    nact = jnp.maximum(jnp.sum(flt), 1.0)
    oct_x = (jnp.sum(jnp.where(active & (dx < 0), 1.0, 0.0)) * 2.0
             > nact).astype(jnp.int32)
    oct_y = (jnp.sum(jnp.where(active & (dy < 0), 1.0, 0.0)) * 2.0
             > nact).astype(jnp.int32)
    oct_z = (jnp.sum(jnp.where(active & (dz < 0), 1.0, 0.0)) * 2.0
             > nact).astype(jnp.int32)
    oct_s = (oct_x << 2) | (oct_y << 1) | oct_z

    # Inactive lanes carry t_best = -BIG: no slab test (tmin < t_best)
    # or MT test can ever pass, so they add nothing to the packet's
    # union visit set. (t_best = 0 was NOT enough: a stale origin
    # inside a node's box gives tmin < 0 and the packet would walk the
    # whole subtree around dead lanes — ADVICE round 1.)
    t0 = jnp.where(active, jnp.float32(BIG), jnp.float32(-BIG))

    rows = PACKET_ROWS
    stack_ref[0] = 0  # root
    carry0 = (
        jnp.int32(1),
        t0,
        jnp.full((rows, 128), -1, jnp.int32),
        jnp.zeros((rows, 128), jnp.float32),
        jnp.zeros((rows, 128), jnp.float32),
    )

    def cond(c):
        return c[0] > 0

    def body(c):
        sp, t_best, tri_best, ub, vb = c
        node = stack_ref[sp - 1]
        sp = sp - 1
        is_leaf = node >= ni

        def leaf_case(args):
            sp, t_best, tri_best, ub, vb = args
            # Leaf rows store only the REAL (non-padding) leaves:
            # padding leaves carry point-at-infinity parent boxes and
            # are never visited, so the clamp below never selects a
            # wrong row for a visited node.
            leaf = jnp.minimum(node - ni, leaves_ref.shape[0] - 1)
            for j in range(k):
                v0x = leaves_ref[leaf, 0 * k + j]
                v0y = leaves_ref[leaf, 1 * k + j]
                v0z = leaves_ref[leaf, 2 * k + j]
                e1x = leaves_ref[leaf, 3 * k + j]
                e1y = leaves_ref[leaf, 4 * k + j]
                e1z = leaves_ref[leaf, 5 * k + j]
                e2x = leaves_ref[leaf, 6 * k + j]
                e2y = leaves_ref[leaf, 7 * k + j]
                e2z = leaves_ref[leaf, 8 * k + j]
                px = dy * e2z - dz * e2y
                py = dz * e2x - dx * e2z
                pz = dx * e2y - dy * e2x
                det = e1x * px + e1y * py + e1z * pz
                inv_det = jnp.where(jnp.abs(det) > _DET_EPS,
                                    1.0 / det, 0.0)
                tx = ox - v0x
                ty = oy - v0y
                tz = oz - v0z
                uu = (tx * px + ty * py + tz * pz) * inv_det
                qx = ty * e1z - tz * e1y
                qy = tz * e1x - tx * e1z
                qz = tx * e1y - ty * e1x
                vv = (dx * qx + dy * qy + dz * qz) * inv_det
                tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                ok = ((jnp.abs(det) > _DET_EPS)
                      & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                      & (tt > TNEAR) & (tt < t_best))
                t_best = jnp.where(ok, tt, t_best)
                tri_best = jnp.where(ok, (node - ni) * k + j, tri_best)
                ub = jnp.where(ok, uu, ub)
                vb = jnp.where(ok, vv, vb)
            return sp, t_best, tri_best, ub, vb

        def internal_case(args):
            sp, t_best, tri_best, ub, vb = args
            # Columns must be static for Mosaic scalar loads; visit
            # ordering is handled by computing each hit child's PUSH
            # SLOT from its priority rank (j XOR oct: 0 = nearest
            # octant). Nearest lands on top of the stack, so LIFO pops
            # visit front-to-back.
            hits = []
            ranks = []
            nd = jnp.minimum(node, ni - 1)
            for j in range(8):
                lox = children_ref[nd, 0 * 8 + j]
                loy = children_ref[nd, 1 * 8 + j]
                loz = children_ref[nd, 2 * 8 + j]
                hix = children_ref[nd, 3 * 8 + j]
                hiy = children_ref[nd, 4 * 8 + j]
                hiz = children_ref[nd, 5 * 8 + j]
                t1x = (lox - ox) * ix
                t2x = (hix - ox) * ix
                t1y = (loy - oy) * iy
                t2y = (hiy - oy) * iy
                t1z = (loz - oz) * iz
                t2z = (hiz - oz) * iz
                tmin = jnp.maximum(
                    jnp.maximum(jnp.minimum(t1x, t2x),
                                jnp.minimum(t1y, t2y)),
                    jnp.minimum(t1z, t2z))
                tmax = jnp.minimum(
                    jnp.minimum(jnp.maximum(t1x, t2x),
                                jnp.maximum(t1y, t2y)),
                    jnp.maximum(t1z, t2z))
                hit = ((tmax >= jnp.maximum(tmin, TNEAR))
                       & (tmin < t_best))
                hits.append(jnp.any(hit).astype(jnp.int32))
                ranks.append(j ^ oct_s)

            for j in range(8):
                # farther-ranked hits go below me: my slot skips them
                ahead = jnp.int32(0)
                for j2 in range(8):
                    if j2 == j:
                        continue
                    ahead = ahead + hits[j2] * (
                        ranks[j2] > ranks[j]).astype(jnp.int32)

                @pl.when(hits[j] == 1)
                def _(slot=sp + ahead, child=node * 8 + 1 + j):
                    stack_ref[slot] = child

            total = hits[0]
            for j in range(1, 8):
                total = total + hits[j]
            return sp + total, t_best, tri_best, ub, vb

        return jax.lax.cond(is_leaf, leaf_case, internal_case,
                            (sp, t_best, tri_best, ub, vb))

    _, t_best, tri_best, ub, vb = jax.lax.while_loop(cond, body, carry0)
    t_ref[:] = t_best
    tri_ref[:] = jnp.where(active, tri_best, -1)
    u_ref[:] = ub
    v_ref[:] = vb


@functools.partial(jax.jit,
                   static_argnames=("ni", "depth", "leaf_size"))
def traverse_packets(children: jnp.ndarray, leaves: jnp.ndarray,
                     ni: int, depth: int,
                     leaf_size: int, o: V3, d: V3,
                     active: jnp.ndarray | None = None) -> Hit:
    """Packetized closest-hit traversal.

    children: [NI, 48] packed children AABBs; leaves: [L_real, 9K]
    packed triangles for the REAL leaves only (no heap padding) — the
    split keeps VMEM occupancy proportional to scene size, not to the
    8^depth padded heap. o/d: V3 of [R]; R padded to a PACKET multiple
    internally. Returns Hit like wbvh.traverse8."""
    r = o.x.shape[0]
    pad = (-r) % PACKET
    rp = r + pad

    def prep(a, fill=0.0):
        if pad:
            a = jnp.concatenate(
                [a, jnp.full((pad,), fill, a.dtype)])
        return a.reshape(rp // 128, 128)

    act = (jnp.ones((r,), jnp.int32) if active is None
           else active.astype(jnp.int32))
    args = (prep(o.x), prep(o.y), prep(o.z),
            prep(d.x), prep(d.y), prep(d.z), prep(act, 0))

    grid = rp // PACKET
    ray_spec = pl.BlockSpec((PACKET_ROWS, 128), lambda g: (g, 0),
                            memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((rp // 128, 128), jnp.float32),
        jax.ShapeDtypeStruct((rp // 128, 128), jnp.int32),
        jax.ShapeDtypeStruct((rp // 128, 128), jnp.float32),
        jax.ShapeDtypeStruct((rp // 128, 128), jnp.float32),
    ]
    kernel = functools.partial(_packet_kernel, ni=ni, k=leaf_size)
    t, tri, u, v = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
        + [ray_spec] * 7,
        out_specs=[ray_spec] * 4,
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((_STACK,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(children, leaves, *args)

    flat = lambda a: a.reshape(rp)[:r]
    return Hit(t=flat(t), tri=flat(tri), u=flat(u), v=flat(v))
