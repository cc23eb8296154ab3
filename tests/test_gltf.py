"""GLB ingest: writer -> parser round trip + reference fixture parity."""

import os

import numpy as np
import pytest

from sycl_ray_tracer_tpu.utils.gltf import (MAT_DIELECTRIC, MAT_DIFFUSE,
                                            MAT_METALLIC, load_glb)
from sycl_ray_tracer_tpu.utils.glb_writer import GlbBuilder

from tests import scenes

REF_ASSETS = "/root/reference/assets"


def test_triangle_roundtrip():
    host = load_glb(scenes.triangle_scene_glb())
    assert host.num_triangles == 1
    assert host.materials.mtype[host.tri_mat[0]] == MAT_DIFFUSE
    assert np.allclose(host.materials.albedo[host.tri_mat[0]],
                       [0.9, 0.2, 0.2])
    assert np.allclose(host.sky_color, [0.5, 0.7, 1.0])
    assert np.allclose(host.camera_position, [0, 0.2, 3])
    assert np.allclose(host.camera_direction, [0, 0, -1])
    assert np.isclose(host.camera_focal_length,
                      1.0 / np.tan(np.deg2rad(45) / 2))


def test_material_classification():
    host = load_glb(scenes.dielectric_scene_glb(subdiv=0))
    kinds = {host.materials.mtype[i] for i in np.unique(host.tri_mat)}
    assert MAT_DIELECTRIC in kinds and MAT_DIFFUSE in kinds
    # dielectric never emits (material.hpp:158-160)
    diel = host.materials.mtype == MAT_DIELECTRIC
    assert (host.materials.emissive[diel] == 0).all()
    # emissive = factor * strength (scene.cpp:198-206)
    emis = host.materials.emissive.max(axis=1)
    assert emis.max() == pytest.approx(8.0)


def test_metallic_threshold():
    # metallicFactor > 0.01 -> metallic (scene.cpp:219)
    b = GlbBuilder()
    m1 = b.add_material(metallic=0.011)
    m2 = b.add_material(metallic=0.009)
    pos = np.array([[-1, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    nrm = np.tile([[0.0, 0, 1]], (3, 1))
    uv = np.zeros((3, 2), np.float32)
    b.add_node(mesh=b.add_mesh(pos, nrm, uv, np.arange(3), m1))
    b.add_node(mesh=b.add_mesh(pos + 2, nrm, uv, np.arange(3), m2))
    host = load_glb(b.tobytes())
    types = host.materials.mtype[host.tri_mat]
    assert set(types) == {MAT_METALLIC, MAT_DIFFUSE}


def test_sky_strength_scaling():
    b = GlbBuilder()
    mat = b.add_material()
    pos = np.array([[-1, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    b.add_node(mesh=b.add_mesh(pos, np.tile([[0.0, 0, 1]], (3, 1)),
                               np.zeros((3, 2)), np.arange(3), mat))
    b.set_sky((0.5, 0.5, 0.5), strength=2.0)
    host = load_glb(b.tobytes())
    assert np.allclose(host.sky_color, 1.0)


def test_node_transform_baking():
    b = GlbBuilder()
    mat = b.add_material()
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    mesh = b.add_mesh(pos, np.tile([[0.0, 0, 1]], (3, 1)),
                      np.zeros((3, 2)), np.arange(3), mat)
    child = b.add_node(mesh=mesh, translation=[1, 0, 0], scale=[2, 2, 2])
    b.add_node(children=[child], translation=[0, 5, 0])
    host = load_glb(b.tobytes())
    # v1 = (1,0,0): child scale*2 + trans(1,0,0) -> (3,0,0); parent +5y
    assert np.allclose(host.tri_v[0, 1], [3, 5, 0])
    # same mesh instanced once -> 1 triangle
    assert host.num_triangles == 1


def test_two_instances_of_one_mesh():
    b = GlbBuilder()
    mat = b.add_material()
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    mesh = b.add_mesh(pos, np.tile([[0.0, 0, 1]], (3, 1)),
                      np.zeros((3, 2)), np.arange(3), mat)
    b.add_node(mesh=mesh, translation=[0, 0, 0])
    b.add_node(mesh=mesh, translation=[10, 0, 0])
    host = load_glb(b.tobytes())
    assert host.num_triangles == 2
    assert np.allclose(sorted(host.tri_v[:, 0, 0]), [0, 10])


def test_global_scale():
    b = GlbBuilder()
    mat = b.add_material()
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    b.add_node(mesh=b.add_mesh(pos, np.tile([[0.0, 0, 1]], (3, 1)),
                               np.zeros((3, 2)), np.arange(3), mat))
    host = load_glb(b.tobytes(), global_scale=(2.0, 2.0, 2.0))
    assert np.allclose(host.tri_v[0, 1], [2, 0, 0])


def test_texture_decode():
    host = load_glb(scenes.textured_scene_glb())
    assert host.textures.shape == (1, 512, 512, 4)
    # checkerboard: both colors present after resize
    assert host.textures[0, :, :, 0].max() > 200
    assert host.textures[0, :, :, 2].max() > 200
    tex_ids = host.materials.tex_id[np.unique(host.tri_mat)]
    assert (tex_ids >= 0).any()


@pytest.mark.skipif(not os.path.exists(f"{REF_ASSETS}/triangle.glb"),
                    reason="reference assets unavailable")
def test_reference_triangle_glb():
    host = load_glb(f"{REF_ASSETS}/triangle.glb")
    assert host.num_triangles >= 1
    assert host.materials.mtype[host.tri_mat[0]] == MAT_DIFFUSE
    assert np.allclose(
        host.materials.albedo[host.tri_mat[0]], [0.8, 0.8, 0.8], atol=1e-5)


@pytest.mark.skipif(not os.path.exists(f"{REF_ASSETS}/cube.glb"),
                    reason="reference assets unavailable")
def test_reference_cube_glb_default_material():
    # cube.glb has a primitive with NO material; reference would assert
    # (scene.cpp:176). We default to diffuse(0.8) — documented deviation.
    host = load_glb(f"{REF_ASSETS}/cube.glb")
    assert host.num_triangles == 12
    m = host.tri_mat[0]
    assert host.materials.mtype[m] == MAT_DIFFUSE
    assert np.allclose(host.materials.albedo[m], 0.8)


def test_srgb_aware_texture_resize():
    """Non-512^2 textures resize sRGB-aware like the reference's
    stbir_resize_uint8_srgb (image_manager.hpp:51-61): filtering
    happens in LINEAR space. A 50/50 black-white blend must encode to
    ~188, not the sRGB-space average 128 (round 1's deviation)."""
    import io as _io

    from PIL import Image

    from sycl_ray_tracer_tpu.utils.gltf import TEX_RES, decode_image_bytes

    # constant image: resize-invariant under any filter
    buf = _io.BytesIO()
    Image.new("RGBA", (64, 64), (200, 50, 10, 255)).save(buf, "PNG")
    out = decode_image_bytes(buf.getvalue())
    assert out.shape == (TEX_RES, TEX_RES, 4)
    assert (out == np.array([200, 50, 10, 255], np.uint8)).all()

    # 1-px black/white stripes at 1024 downscaled 2x: every output
    # texel is a ~50/50 blend. linear avg 0.5 -> sRGB 188.
    arr = np.zeros((1024, 1024, 4), np.uint8)
    arr[:, ::2, :3] = 255
    arr[..., 3] = 255
    buf = _io.BytesIO()
    Image.fromarray(arr).save(buf, "PNG")
    out = decode_image_bytes(buf.getvalue())
    grays = out[..., 0].astype(np.int32)
    assert grays.min() >= 170 and grays.max() <= 205, (
        grays.min(), grays.max())
    # 512^2 inputs pass through byte-exact (no resample)
    buf = _io.BytesIO()
    Image.fromarray(arr[:512, :512]).save(buf, "PNG")
    out = decode_image_bytes(buf.getvalue())
    assert (out == arr[:512, :512]).all()
