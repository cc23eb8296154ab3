"""Shared-BLAS instancing (round-5 VERDICT #6): loader grouping, bake
parity, global-tree validity, and kernel-level hit parity of the
instanced drain (traverse_pallas5 itf mode) vs the baked path."""

import numpy as np
import jax.numpy as jnp
import pytest

from sycl_ray_tracer_tpu.ops import sah, wbvh
from sycl_ray_tracer_tpu.ops.vec import V3
from sycl_ray_tracer_tpu.utils.fixtures import instanced_scene_glb
from sycl_ray_tracer_tpu.utils.gltf import load_glb
from sycl_ray_tracer_tpu.utils.instanced import load_glb_instanced


def _interp5(*args, **kw):
    import sycl_ray_tracer_tpu.ops.traverse_pallas5 as TP5
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    TP5.pl.pallas_call = patched
    try:
        return TP5.traverse_packets5(*args, **kw)
    finally:
        TP5.pl.pallas_call = orig


def test_loader_groups_unique_prims():
    ih = load_glb_instanced(instanced_scene_glb(50))
    assert ih.num_instances > 50  # 50 cubes + floor/lamp nodes
    assert ih.num_unique_triangles < ih.num_world_triangles / 5
    # bake() reproduces the default loader bit-for-bit (same node
    # traversal order)
    hb = load_glb(instanced_scene_glb(50))
    b = ih.bake()
    assert b.tri_v.shape == hb.tri_v.shape
    np.testing.assert_array_equal(b.tri_v, hb.tri_v)
    np.testing.assert_array_equal(b.tri_mat, hb.tri_mat)


def test_instanced_build_and_kernel_parity():
    """Instanced global tree + itf drains find the same hits as the
    baked SAH tree + plain drains (same rays, interpret mode)."""
    ih = load_glb_instanced(instanced_scene_glb(30))
    from sycl_ray_tracer_tpu.models.instanced import (
        build_instanced_device_scene)

    if sah.build_sah(ih.prims[0].tri_v, 8) is None:
        pytest.skip("native SAH library unavailable")
    scene = build_instanced_device_scene(ih)
    assert scene.has_instances

    hb = ih.bake()
    sahb = sah.build_sah(hb.tri_v, 8)
    rows = sah.leaf_rows(hb.tri_v, sahb.order, 8)
    ct_b, lt_b = wbvh.pack_tiles_np(sahb.children, sahb.child_ids,
                                    rows, 8)

    rs = np.random.RandomState(0)
    r = 1024
    o_np = np.broadcast_to(
        np.asarray(hb.camera_position, np.float32), (r, 3)).copy()
    d_np = rs.randn(r, 3).astype(np.float32)
    d_np /= np.linalg.norm(d_np, axis=1, keepdims=True)
    o = V3(*(jnp.asarray(o_np[:, i]) for i in range(3)))
    d = V3(*(jnp.asarray(d_np[:, i]) for i in range(3)))

    hit_i = _interp5(scene.bvh_ctiles, scene.bvh_ltiles,
                     scene.sah_ni, 8, o, d, ldesc=scene.inst_ldesc)
    hit_b = _interp5(jnp.asarray(ct_b), jnp.asarray(lt_b),
                     sahb.num_internal, 8, o, d)

    ti = np.asarray(hit_i.t)
    tb = np.asarray(hit_b.t)
    mi = np.asarray(hit_i.tri) >= 0
    mb = np.asarray(hit_b.tri) >= 0
    assert (mi == mb).mean() > 0.999
    both = mi & mb
    assert both.mean() > 0.3  # the fixture fills the view
    # t parity: identical geometry, different spaces -> float noise
    rel = np.abs(ti[both] - tb[both]) / np.maximum(tb[both], 1e-3)
    assert np.percentile(rel, 99) < 1e-3
    assert rel.max() < 3e-2

    # composed hit ids decompose into valid (inst, shared row) and
    # the instanced u/v match the baked u/v on agreeing lanes
    comp = np.asarray(
        jnp.take(scene.bvh_remap,
                 jnp.maximum(np.asarray(hit_i.tri), 0)))
    s8 = scene.inst_s8
    inst = comp[both] // s8
    row = comp[both] % s8
    assert (inst >= 0).all() and (inst < ih.num_instances).all()
    assert (row >= 0).all() and (row < s8).all()
    # barycentrics are space-invariant
    du = np.abs(np.asarray(hit_i.u)[both] - np.asarray(hit_b.u)[both])
    close_t = rel < 1e-4
    assert np.percentile(du[close_t], 95) < 1e-3


def test_instanced_memory_scaling():
    """The 10k-instance story at fixture scale: instanced tables grow
    ~linearly in instance count with a small constant, not the baked
    540-910 B/tri."""
    from sycl_ray_tracer_tpu.models.instanced import (
        build_instanced_device_scene)

    ih = load_glb_instanced(instanced_scene_glb(200))
    if sah.build_sah(ih.prims[0].tri_v, 8) is None:
        pytest.skip("native SAH library unavailable")
    scene = build_instanced_device_scene(ih)
    per_tri = ((scene.bvh_ctiles.size + scene.bvh_ltiles.size
                + scene.inst_ldesc.size + scene.bvh_remap.size
                + scene.shade_tbl.size) * 4
               / ih.num_world_triangles)
    # baked device tables measured 540-910 B/tri
    # (tools/probe_instancing.py); shared must be several x below
    assert per_tri < 200, per_tri
