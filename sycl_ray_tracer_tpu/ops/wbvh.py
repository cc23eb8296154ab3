"""WBVH8: 8-wide implicit BVH, built for TPU gather economics.

Replaces Embree's BVH (the reference's rtcIntersect1 hot path,
trace_ray.hpp:22) with a layout chosen from measured TPU behavior:
a gather op costs ~the same for 1-wide and 48-wide rows (op-latency
bound, not bandwidth bound), so the design packs ALL the data a
traversal step needs into ONE row:

- Internal node i packs its 8 children's AABBs into one 48-float row
  (children_boxes[i] = 8 x [lo.xyz, hi.xyz]). Child ids are computed
  (8i+1..8i+8), never loaded.
- Leaf j packs its K triangles into one K*9-float row
  (v0, e1, e2 per triangle).

Topology is an implicit complete 8-ary heap over Morton-sorted
triangle leaves (level-order ids; internal ids [0, NI), leaves
[NI, NI+L)). Because the heap is built by collapsing 3 levels of the
binary Morton split, a node's 8 children correspond to its octant
split — child index bits ARE octant bits. Traversal exploits that for
approximate front-to-back ordering: visiting children in the order
(child_index XOR ray_octant) walks the octants the ray enters first
(the classic octree DDA ordering).

Traversal state per ray is tiny — no stack arrays:
- cur: current node id,
- trail: [D] bytes, trail[d] = pending-sibling bitmask at depth d+1
  (bit p corresponds to child (p XOR oct) — stored pre-permuted so
  "lowest set bit" = "nearest unvisited sibling"),
- best hit (t, tri, u, v).

Each iteration does exactly two gathers (children row, leaf row) plus
fused vector math; everything else is integer index arithmetic.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from sycl_ray_tracer_tpu.ops import lbvh
from sycl_ray_tracer_tpu.ops.intersect import BIG, TNEAR, Hit, moller_trumbore
from sycl_ray_tracer_tpu.ops.vec import V3

_INF = np.float32(3.0e38)


class Wbvh8(NamedTuple):
    """children_boxes: [NI, 48] — 8 x (lo.xyz, hi.xyz) per internal node.
    leaf_tris: [L, K*9] — K x (v0, e1, e2) per leaf, degenerate padding.
    order: [L*K] int32 — sorted slot -> original triangle id (-1 pad).
    """

    children_boxes: jnp.ndarray
    leaf_tris: jnp.ndarray
    order: jnp.ndarray

    @property
    def num_internal(self) -> int:
        return self.children_boxes.shape[0]

    @property
    def num_leaves(self) -> int:
        return self.leaf_tris.shape[0]

    @property
    def leaf_size(self) -> int:
        return self.leaf_tris.shape[1] // 9

    @property
    def depth(self) -> int:
        # L = 8^D
        l = self.num_leaves
        d = 0
        while l > 1:
            l //= 8
            d += 1
        return d


def _ceil_log8(n: int) -> int:
    d = 0
    c = 1
    while c < n:
        c *= 8
        d += 1
    return d


def build(tri_v: jnp.ndarray, leaf_size: int = 8):
    """Returns (Wbvh8, sorted_tri_v [L*K,3,3], valid [L*K]).

    Jittable; runs on-device. Uses the same Morton sort as the binary
    LBVH, then fits binary levels and collapses 3 per 8-ary level.
    """
    n = tri_v.shape[0]
    k = leaf_size
    depth = max(_ceil_log8(max(-(-n // k), 1)), 1)
    l_leaves = 8 ** depth

    # Morton order (reuse binary machinery, padded to 8^D leaves).
    centroids = tri_v.mean(axis=1) if n else jnp.zeros((0, 3))
    lo = centroids.min(axis=0) if n else jnp.zeros(3)
    hi = centroids.max(axis=0) if n else jnp.ones(3)
    codes = lbvh.morton30(centroids, lo, hi) if n else jnp.zeros(
        (0,), jnp.uint32)
    perm = jnp.argsort(codes).astype(jnp.int32)
    pad = l_leaves * k - n
    order = jnp.concatenate([perm, jnp.full((pad,), -1, jnp.int32)])
    valid = order >= 0
    safe = jnp.maximum(order, 0)
    if n:
        sorted_v = jnp.take(tri_v, safe, axis=0)
        sorted_v = jnp.where(valid[:, None, None], sorted_v, 0.0)
    else:
        sorted_v = jnp.zeros((l_leaves * k, 3, 3), tri_v.dtype)

    # Per-leaf AABBs.
    lo_tri = jnp.where(valid[:, None], sorted_v.min(axis=1), _INF)
    hi_tri = jnp.where(valid[:, None], sorted_v.max(axis=1), -_INF)
    leaf_lo = lo_tri.reshape(l_leaves, k, 3).min(axis=1)
    leaf_hi = hi_tri.reshape(l_leaves, k, 3).max(axis=1)

    # Binary levels bottom-up: levels[i] has 8^depth / 2^i nodes.
    lvl_lo = [leaf_lo]
    lvl_hi = [leaf_hi]
    while lvl_lo[0].shape[0] > 1:
        lvl_lo.insert(0, jnp.minimum(lvl_lo[0][0::2], lvl_lo[0][1::2]))
        lvl_hi.insert(0, jnp.maximum(lvl_hi[0][0::2], lvl_hi[0][1::2]))

    # 8-ary internal level d's children = binary level 3(d+1), reshaped
    # so each internal node's row holds its 8 children boxes.
    #
    # Empty (padding) subtrees carry inverted boxes through the min/max
    # fit, but an inverted box does NOT fail a branchless slab test (its
    # +/-inf slabs cancel into "no constraint"). Canonicalize empties to
    # the point-at-infinity box (BIG, BIG), which misses every ray under
    # IEEE semantics: every axis yields tmin=tmax=+/-inf of one sign, so
    # either tmax < max(tmin, TNEAR) or tmin >= t_best.
    blocks = []
    for d in range(depth):
        bl = lvl_lo[3 * (d + 1)]
        bh = lvl_hi[3 * (d + 1)]
        empty = (bh[:, :1] < bl[:, :1])
        bl = jnp.where(empty, _INF, bl)
        bh = jnp.where(empty, _INF, bh)
        box = jnp.concatenate([bl, bh], axis=1)  # [8^(d+1), 6]
        blocks.append(box.reshape(8 ** d, 48))
    children_boxes = jnp.concatenate(blocks, axis=0)

    # Leaf triangle rows: [L, K*9] = K x (v0, e1, e2).
    v0 = sorted_v[:, 0, :]
    e1 = sorted_v[:, 1, :] - sorted_v[:, 0, :]
    e2 = sorted_v[:, 2, :] - sorted_v[:, 0, :]
    leaf_tris = jnp.concatenate([v0, e1, e2], axis=1).reshape(
        l_leaves, k * 9)

    return Wbvh8(children_boxes=children_boxes, leaf_tris=leaf_tris,
                 order=order), sorted_v, valid


def _lowest_bit_index(m: jnp.ndarray) -> jnp.ndarray:
    """Index of the lowest set bit of m (int32, m != 0). Exact for
    8-bit masks: log2 of a power of two is exact in f32."""
    lsb = m & -m
    return jnp.log2(lsb.astype(jnp.float32)).astype(jnp.int32)


def traverse8(bvh_children: jnp.ndarray, bvh_leaves: jnp.ndarray,
              depth: int, leaf_size: int,
              o: V3, d: V3,
              active_in: jnp.ndarray | None = None) -> Hit:
    """Closest-hit traversal of a Wbvh8.

    bvh_children: [NI, 48]; bvh_leaves: [L, K*9]; o/d: V3 of [R].
    Returns Hit with tri ids in sorted-slot order (-1 = miss).
    """
    ni = bvh_children.shape[0]
    k = leaf_size
    r = o.x.shape[0]

    inv = V3(
        jnp.where(jnp.abs(d.x) > 1e-20, 1.0 / d.x, jnp.float32(1e20)),
        jnp.where(jnp.abs(d.y) > 1e-20, 1.0 / d.y, jnp.float32(1e20)),
        jnp.where(jnp.abs(d.z) > 1e-20, 1.0 / d.z, jnp.float32(1e20)),
    )
    # Octant bits match Morton child-index bits: (x << 2) | (y << 1) | z.
    oct_ = ((d.x < 0).astype(jnp.int32) << 2
            | (d.y < 0).astype(jnp.int32) << 1
            | (d.z < 0).astype(jnp.int32))

    active0 = jnp.ones((r,), bool) if active_in is None else active_in

    state = dict(
        cur=jnp.zeros((r,), jnp.int32),       # start at root (internal 0)
        level=jnp.zeros((r,), jnp.int32),     # depth of cur
        trail=tuple(jnp.zeros((r,), jnp.int32) for _ in range(depth)),
        t=jnp.full((r,), BIG, jnp.float32),
        tri=jnp.full((r,), -1, jnp.int32),
        u=jnp.zeros((r,), jnp.float32),
        v=jnp.zeros((r,), jnp.float32),
        alive=active0,
    )

    def cond(s):
        return jnp.any(s["alive"])

    def step(s):
        cur, level, trail, alive = s["cur"], s["level"], s["trail"], s["alive"]
        is_leaf = cur >= ni

        # ---------- internal phase: one 48-wide gather ----------------
        # SoA layout discipline: transpose the gathered rows ONCE so all
        # subsequent math runs on full-width [R] vectors — [R, 8]
        # intermediates would put 8 in the VPU lane dim and waste 15/16
        # of the machine.
        g = jnp.take(bvh_children, jnp.clip(cur, 0, ni - 1), axis=0)
        cols = g.T  # [48, R]
        not_leaf_live = (~is_leaf) & alive
        pm = jnp.zeros((r,), jnp.int32)
        for j in range(8):
            b = cols[j * 6:(j + 1) * 6]
            t1x = (b[0] - o.x) * inv.x
            t1y = (b[1] - o.y) * inv.y
            t1z = (b[2] - o.z) * inv.z
            t2x = (b[3] - o.x) * inv.x
            t2y = (b[4] - o.y) * inv.y
            t2z = (b[5] - o.z) * inv.z
            tmin = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                           jnp.minimum(t1y, t2y)),
                               jnp.minimum(t1z, t2z))
            tmax = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                           jnp.maximum(t1y, t2y)),
                               jnp.maximum(t1z, t2z))
            hit_j = ((tmax >= jnp.maximum(tmin, TNEAR)) & (tmin < s["t"])
                     & not_leaf_live)
            # Pre-permuted pending mask: bit p <-> child (p XOR oct).
            pm = pm | (hit_j.astype(jnp.int32) << (j ^ oct_))

        # ---------- leaf phase: one K*9-wide gather --------------------
        leaf_idx = jnp.clip(cur - ni, 0, bvh_leaves.shape[0] - 1)
        rows = jnp.take(bvh_leaves, leaf_idx, axis=0).T  # [K*9, R]
        do_leaf = alive & is_leaf
        t_new = s["t"]
        tri_new = s["tri"]
        u_new = s["u"]
        v_new = s["v"]
        for j in range(k):
            c9 = rows[j * 9:(j + 1) * 9]
            v0 = V3(c9[0], c9[1], c9[2])
            e1 = V3(c9[3], c9[4], c9[5])
            e2 = V3(c9[6], c9[7], c9[8])
            ok, tt, uu, vv = moller_trumbore(o, d, v0, e1, e2, t_new)
            ok = ok & do_leaf
            better = ok & (tt < t_new)
            t_new = jnp.where(better, tt, t_new)
            tri_new = jnp.where(better, (cur - ni) * k + j, tri_new)
            u_new = jnp.where(better, uu, u_new)
            v_new = jnp.where(better, vv, v_new)

        # ---------- advance --------------------------------------------
        # trail is a TUPLE of depth [R] arrays (SoA again); every op
        # below is a full-width [R] vector op, unrolled over depth.
        has = pm != 0
        descend = alive & ~is_leaf & has

        p_low = _lowest_bit_index(jnp.where(has, pm, 1))
        child = cur * 8 + 1 + (p_low ^ oct_)
        rest = pm & (pm - 1)  # clear lowest bit
        # store pending siblings at trail[level] (mask over children at
        # depth level+1)
        trail_desc = tuple(
            jnp.where(descend & (level == dd), rest, trail[dd])
            for dd in range(depth))

        # backtrack lanes: leaf lanes and internal lanes with no hits
        backtrack = alive & (is_leaf | (~is_leaf & ~has))
        # deepest level with pending bits
        dstar = jnp.full((r,), -1, jnp.int32)
        for dd in range(depth):
            dstar = jnp.where(trail_desc[dd] != 0, dd, dstar)
        dead = backtrack & (dstar < 0)
        # pending mask at d*
        pm_b = jnp.zeros((r,), jnp.int32)
        for dd in range(depth):
            pm_b = jnp.where(dstar == dd, trail_desc[dd], pm_b)
        p_b = _lowest_bit_index(jnp.where(pm_b != 0, pm_b, 1))
        rest_b = pm_b & (pm_b - 1)
        # ancestor of cur at depth dstar (apply parent op (level-dstar)
        # times)
        steps = jnp.clip(level - dstar, 0, depth)
        anc = cur
        for si in range(depth):
            anc = jnp.where(si < steps, (anc - 1) // 8, anc)
        child_b = anc * 8 + 1 + (p_b ^ oct_)
        pop = backtrack & ~dead
        trail_new = tuple(
            jnp.where(pop & (dstar == dd), rest_b, trail_desc[dd])
            for dd in range(depth))

        cur_new = jnp.where(descend, child, jnp.where(pop, child_b, cur))
        level_new = jnp.where(descend, level + 1,
                              jnp.where(pop, dstar + 1, level))
        alive_new = alive & ~dead

        return dict(cur=cur_new, level=level_new, trail=trail_new,
                    t=t_new, tri=tri_new, u=u_new, v=v_new,
                    alive=alive_new)

    out = jax.lax.while_loop(cond, step, state)
    return Hit(t=out["t"], tri=out["tri"], u=out["u"], v=out["v"])
