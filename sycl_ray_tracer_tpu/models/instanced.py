"""Two-level (shared-BLAS) instanced scene build (round-5 VERDICT #6).

The TPU-native analog of the reference's Embree BLAS-per-primitive +
TLAS-of-instances (/root/reference/src/scene.cpp:404-439, 487-507):

- ONE local-space SAH BVH8 per unique primitive (built once).
- A global BVH8 whose internal nodes are: a TLAS over instance world
  boxes + per-instance copies of the local INTERNAL nodes with
  conservatively transformed AABBs (center/half-extent |M| form).
  Only node boxes are per-instance (~76 B/node); leaf geometry
  (MT tiles), shading rows, and materials stay PER-UNIQUE-TRIANGLE.
- Each global leaf carries a descriptor row (inst_ldesc): the shared
  leaf tile slot, the instance id, and the 12 floats of the
  world->local transform. The packet kernel (traverse_pallas5 itf
  mode) transforms the RAYS into instance space at drain time —
  leaving d' unnormalized keeps t world-valid, so t_init chaining and
  the closest-hit algebra are unchanged.
- Hit ids are composed as inst * S8 + shared_slot (S8 = shared
  shading rows) through the existing bvh_remap gather; shade_lanes
  decomposes them and rotates the LOCAL shading normal by the
  instance's inverse-transpose (models/trace.py).

Memory: R instances of a T-tri mesh cost ~(R*T/8/7) transformed
internal nodes (~20 B/tri) + 512 B/leaf of descriptors + ONE copy of
the 540-910 B/tri geometry/shading tables — vs the baked ingest's
R x everything (tools/probe_instancing.py).
"""

from __future__ import annotations

import os
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from sycl_ray_tracer_tpu.models.scene import DeviceScene
from sycl_ray_tracer_tpu.ops import sah as _sah
from sycl_ray_tracer_tpu.ops import wbvh
from sycl_ray_tracer_tpu.utils.instanced import InstancedHostScene

_INF = np.float32(3.0e38)


def _transform_children(children: np.ndarray, m3: np.ndarray,
                        tr: np.ndarray) -> np.ndarray:
    """Conservative world boxes of local child AABBs [NI, 48]
    (6 comps x 8 children): c' = M c + t, h' = |M| h. Empty slots
    (lo >= _INF, the builder's point-at-infinity canonical form) stay
    empty."""
    ni = children.shape[0]
    b = children.reshape(ni, 6, 8)
    lo = b[:, 0:3].transpose(0, 2, 1)      # [NI, 8, 3]
    hi = b[:, 3:6].transpose(0, 2, 1)
    empty = lo[:, :, 0] >= _INF
    lo = np.where(empty[:, :, None], 0.0, lo)
    hi = np.where(empty[:, :, None], 0.0, hi)
    c = (lo + hi) * 0.5
    h = (hi - lo) * 0.5
    c2 = c @ m3.T + tr
    h2 = h @ np.abs(m3).T
    lo2 = (c2 - h2).astype(np.float32)
    hi2 = (c2 + h2).astype(np.float32)
    lo2[empty] = _INF
    hi2[empty] = _INF
    out = np.empty_like(b)
    out[:, 0:3] = lo2.transpose(0, 2, 1)
    out[:, 3:6] = hi2.transpose(0, 2, 1)
    return out.reshape(ni, 48)


def _build_tlas(boxes: np.ndarray) -> Tuple[list, np.ndarray]:
    """8-ary TLAS over instance world boxes [R, 6] (lo3, hi3).

    Returns (nodes, order): nodes is a list of (child_boxes [8, 6],
    child_refs [8]) where a ref >= 0 is another TLAS node index and
    ref < 0 encodes ~instance_index; `order` is the Morton instance
    order (unused by callers today, returned for tests). The root is
    node 0; a root exists even for R == 1."""
    r = boxes.shape[0]
    cent = (boxes[:, 0:3] + boxes[:, 3:6]) * 0.5
    lo = cent.min(0)
    span = np.maximum(cent.max(0) - lo, 1e-12)
    q = np.clip(((cent - lo) / span * 1023), 0, 1023).astype(np.uint64)
    morton = np.zeros(r, np.uint64)
    for i in range(10):
        for a in range(3):
            morton |= ((q[:, a] >> np.uint64(i)) & np.uint64(1)) << \
                np.uint64(3 * i + (2 - a))
    order = np.argsort(morton, kind="stable")

    nodes: list = []

    def rec(idx: np.ndarray, force_node: bool):
        n = idx.shape[0]
        if n == 1 and not force_node:
            b = boxes[idx[0]]
            return ~int(idx[0]), b
        my = len(nodes)
        nodes.append(None)
        cb = np.full((8, 6), _INF, np.float32)
        cr = np.zeros((8,), np.int64)
        step = -(-n // 8)
        j = 0
        lo_u = np.full(3, _INF, np.float32)
        hi_u = np.full(3, -_INF, np.float32)
        for s in range(0, n, step):
            ref, bx = rec(idx[s: s + step], False)
            cb[j] = bx
            cr[j] = ref
            lo_u = np.minimum(lo_u, bx[0:3])
            hi_u = np.maximum(hi_u, bx[3:6])
            j += 1
        nodes[my] = (cb, cr)
        return my, np.concatenate([lo_u, hi_u])

    rec(order, True)
    return nodes, order


def build_instanced_device_scene(ih: InstancedHostScene,
                                 leaf_size: int = 8) -> DeviceScene:
    if leaf_size != 8:
        raise ValueError("instanced scenes require leaf_size=8")
    n_prims = len(ih.prims)
    r = ih.num_instances
    if r == 0 or n_prims == 0:
        raise ValueError("instanced scene has no instances")

    # --- per-unique-primitive local BVH8 + shared leaf tiles ---
    built = []
    for p in ih.prims:
        b = _sah.build_sah(p.tri_v, leaf_size)
        if b is None:
            bvh, _, _ = wbvh.build_np(p.tri_v, leaf_size)
            ids = wbvh.heap_child_ids_np(bvh.num_internal)
            rows = np.asarray(bvh.leaves)
            b = _sah.SahBvh(
                children=np.asarray(bvh.children), child_ids=ids,
                order=np.asarray(bvh.order),
                num_internal=bvh.num_internal,
                num_leaves=rows.shape[0], depth=bvh.depth,
                leaf_size=leaf_size, num_refs=p.tri_v.shape[0],
                width=8)
            built.append((b, rows))
        else:
            built.append((b, _sah.leaf_rows(p.tri_v, b.order,
                                            leaf_size)))

    sbase = np.zeros(n_prims, np.int64)   # shared leaf-slot base
    acc = 0
    for i, (b, rows) in enumerate(built):
        sbase[i] = acc
        acc += rows.shape[0]
    shared_leaves = acc
    s8 = shared_leaves * leaf_size
    if r * s8 >= (1 << 31):
        raise ValueError(
            f"instances({r}) x shared rows({s8}) overflow int32 "
            "composed hit ids")

    shared_rows = np.concatenate([rows for _, rows in built])
    dummy_children = np.full((1, 48), _INF, np.float32)
    dummy_children[0, :24] = 0.0  # lo rows 0 (unused)
    _, ltiles = wbvh.pack_tiles_np(
        np.zeros((1, 48), np.float32), np.zeros((1, 8), np.int32),
        shared_rows, leaf_size)

    # --- global id layout ---
    ni_inst = np.array([b.num_internal for b, _ in built])
    nl_inst = np.array([b.num_leaves for b, _ in built])
    inst_ni = ni_inst[ih.inst_prim]            # [I]
    inst_nl = nl_inst[ih.inst_prim]
    # instance world root boxes (from transformed local root children)
    root_boxes = np.empty((r, 6), np.float32)
    tchildren: List[np.ndarray] = []
    inv_m = np.empty((r, 12), np.float32)
    nmat = np.empty((r, 9), np.float32)
    from sycl_ray_tracer_tpu.utils.gltf import _invert3x3_transpose
    for i in range(r):
        b, _ = built[ih.inst_prim[i]]
        m4 = ih.inst_mat[i]
        m3 = m4[:3, :3]
        tr = m4[:3, 3]
        tc = _transform_children(b.children, m3, tr)
        tchildren.append(tc)
        bb = tc.reshape(-1, 6, 8)
        lo = bb[:, 0:3]
        real = lo[:, 0] < _INF          # [NI, 8]
        lo_u = np.where(real[:, None, :], bb[:, 0:3], _INF).min((0, 2))
        hi_u = np.where(real[:, None, :], bb[:, 3:6], -_INF).max((0, 2))
        root_boxes[i, 0:3] = lo_u
        root_boxes[i, 3:6] = hi_u
        m4i = np.linalg.inv(m4)
        inv_m[i, 0:9] = m4i[:3, :3].reshape(-1)
        inv_m[i, 9:12] = m4i[:3, 3]
        nmat[i] = _invert3x3_transpose(m3).reshape(-1)

    tlas_nodes, _ = _build_tlas(root_boxes)
    ni_tlas = len(tlas_nodes)
    ibase = np.zeros(r, np.int64)
    lbase = np.zeros(r, np.int64)
    acc_n, acc_l = ni_tlas, 0
    for i in range(r):
        ibase[i] = acc_n
        lbase[i] = acc_l
        acc_n += inst_ni[i]
        acc_l += inst_nl[i]
    ni_global = acc_n
    l_global = acc_l
    if ni_global + l_global >= (1 << 24):
        raise ValueError("instanced tree exceeds exact-f32 child ids")

    # --- global children/ids arrays ---
    children_g = np.zeros((ni_global, 48), np.float32)
    ids_g = np.zeros((ni_global, 8), np.int32)
    for t, (cb, cr) in enumerate(tlas_nodes):
        children_g[t] = cb.transpose(1, 0).reshape(48)
        gid = np.where(
            cr >= 0, cr,
            ibase[np.clip(~cr, 0, r - 1)]).astype(np.int64)
        empty = cb[:, 0] >= _INF
        gid[empty] = 0
        ids_g[t] = gid.astype(np.int32)
    for i in range(r):
        b, _ = built[ih.inst_prim[i]]
        ni_l = b.num_internal
        tc = tchildren[i]
        lids = b.child_ids.astype(np.int64)
        is_leaf = lids >= ni_l
        gids = np.where(is_leaf,
                        ni_global + lbase[i] + (lids - ni_l),
                        ibase[i] + lids)
        bb = tc.reshape(-1, 6, 8)
        empty = bb[:, 0, :] >= _INF
        gids[empty] = 0
        children_g[ibase[i]: ibase[i] + ni_l] = tc
        ids_g[ibase[i]: ibase[i] + ni_l] = gids.astype(np.int32)

    ctiles, _ = wbvh.pack_tiles_np(
        children_g, ids_g, np.zeros((1, 9 * leaf_size), np.float32),
        leaf_size)

    # --- leaf descriptors [Lg, 128] ---
    ldesc = np.zeros((l_global, 128), np.float32)
    leaf_inst = np.empty(l_global, np.int64)
    leaf_shared = np.empty(l_global, np.int64)
    for i in range(r):
        p = ih.inst_prim[i]
        nl = inst_nl[i]
        sl = slice(lbase[i], lbase[i] + nl)
        leaf_inst[sl] = i
        leaf_shared[sl] = sbase[p] + np.arange(nl)
    ldesc[:, 0] = leaf_shared.astype(np.float32)
    ldesc[:, 1] = leaf_inst.astype(np.float32)
    ldesc[:, 2:14] = inv_m[leaf_inst]

    # --- composed hit remap: global slot -> inst * S8 + shared row ---
    slot_shared = (leaf_shared[:, None] * leaf_size
                   + np.arange(leaf_size)[None, :])
    remap = (leaf_inst[:, None] * s8 + slot_shared).reshape(-1)
    remap = remap.astype(np.int32)

    # --- shared shading tables (LOCAL-space normals) ---
    tri_n_parts, tri_uv_parts, tri_mat_parts = [], [], []
    for (b, rows), p in zip(built, ih.prims):
        order = np.asarray(b.order)
        safe = np.maximum(order, 0)
        valid = order >= 0
        tn = p.tri_n[safe]
        ln = np.linalg.norm(tn, axis=-1, keepdims=True)
        tn = (tn / np.maximum(ln, 1e-20)).astype(np.float32)
        tn[~valid] = 0.0
        tu = p.tri_uv[safe].astype(np.float32)
        tu[~valid] = 0.0
        tm = p.tri_mat[safe].astype(np.int32)
        tm[~valid] = 0
        tri_n_parts.append(tn)
        tri_uv_parts.append(tu)
        tri_mat_parts.append(tm)
    tri_n = np.concatenate(tri_n_parts)
    tri_uv = np.concatenate(tri_uv_parts)
    tri_mat = np.concatenate(tri_mat_parts)
    lk = tri_n.shape[0]
    assert lk == s8
    stbl = np.zeros((16, lk), np.float32)
    stbl[0:9] = tri_n.reshape(lk, 9).T
    stbl[9:15] = tri_uv.reshape(lk, 6).T
    stbl[15] = tri_mat.astype(np.float32)

    m = ih.materials
    z3 = jnp.zeros((1, 3), jnp.float32)
    zt = jnp.zeros((1, 1, 8, 128), jnp.float32)
    scene_lo = root_boxes[:, 0:3].min(0)
    scene_hi = root_boxes[:, 3:6].max(0)
    return DeviceScene(
        shade_tbl=jnp.asarray(np.ascontiguousarray(stbl.T)),
        bvh_nodes=jnp.zeros((1, 48), jnp.float32),
        bvh_children=jnp.zeros((1, 48), jnp.float32),
        bvh_leaves=jnp.zeros((1, 9 * leaf_size), jnp.float32),
        bvh_ctiles=jnp.asarray(ctiles),
        bvh_ltiles=jnp.asarray(ltiles),
        bvh_wtiles=jnp.zeros((1, 8, 128), jnp.float32),
        bvh_remap=jnp.asarray(remap),
        has_wtiles=False,
        inst_ldesc=jnp.asarray(ldesc),
        inst_nmat=jnp.asarray(nmat),
        has_instances=True,
        inst_s8=int(s8),
        lbvh_lo=z3, lbvh_hi=z3, lbvh_v0=z3, lbvh_e1=z3, lbvh_e2=z3,
        tl_ctiles=zt, tl_ltiles=zt,
        tl_remap=jnp.zeros((1, 1), jnp.int32),
        tl_lo=z3, tl_hi=z3, tl_count=0, tl_ni=1,
        intersector="auto", cfmt="f32",
        has_tiles=True,
        has_textures=bool(len(m.tex_id)
                          and (np.asarray(m.tex_id) >= 0).any()),
        has_sah=True,
        sah_ni=int(ni_global),
        tri_n=jnp.asarray(tri_n), tri_uv=jnp.asarray(tri_uv),
        tri_mat=jnp.asarray(tri_mat),
        mat_type=jnp.asarray(m.mtype.astype(np.int32)),
        mat_albedo=jnp.asarray(m.albedo),
        mat_tex=jnp.asarray(m.tex_id),
        mat_rough=jnp.asarray(m.roughness),
        mat_ior=jnp.asarray(m.ior),
        mat_emissive=jnp.asarray(m.emissive),
        tex_res=int(ih.textures.shape[1]),
        tex_packed=jnp.asarray(
            (ih.textures[..., 0].astype(np.uint32)
             | (ih.textures[..., 1].astype(np.uint32) << 8)
             | (ih.textures[..., 2].astype(np.uint32) << 16)
             | (ih.textures[..., 3].astype(np.uint32) << 24)
             ).reshape(-1)),
        sky_color=jnp.asarray(ih.sky_color),
        scene_lo=jnp.asarray(scene_lo.astype(np.float32)),
        scene_hi=jnp.asarray(scene_hi.astype(np.float32)),
        leaf_size=leaf_size,
        bvh_depth=1,
        bvh_ni=1,
        num_triangles=ih.num_world_triangles,
    )
