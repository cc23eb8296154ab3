"""Native (C++) vs pure-Python GLB ingest equivalence."""

import numpy as np
import pytest

from sycl_ray_tracer_tpu.utils import native_loader
from sycl_ray_tracer_tpu.utils.gltf import load_glb

from tests import scenes

pytestmark = pytest.mark.skipif(
    not native_loader.available(),
    reason="native library not built (no compiler?)")


def _compare(glb_bytes, **kw):
    py = load_glb(glb_bytes, use_native=False, **kw)
    nat = load_glb(glb_bytes, use_native=True, **kw)
    assert nat.num_triangles == py.num_triangles
    assert np.allclose(nat.tri_v, py.tri_v, atol=1e-5)
    assert np.allclose(nat.tri_n, py.tri_n, atol=1e-5)
    assert np.allclose(nat.tri_uv, py.tri_uv, atol=1e-6)
    assert (nat.tri_mat == py.tri_mat).all()
    assert (nat.materials.mtype == py.materials.mtype).all()
    assert np.allclose(nat.materials.albedo, py.materials.albedo)
    assert (nat.materials.tex_id == py.materials.tex_id).all()
    assert np.allclose(nat.materials.roughness, py.materials.roughness)
    assert np.allclose(nat.materials.ior, py.materials.ior)
    assert np.allclose(nat.materials.emissive, py.materials.emissive)
    assert np.allclose(nat.sky_color, py.sky_color)
    assert np.allclose(nat.camera_position, py.camera_position, atol=1e-5)
    assert np.allclose(nat.camera_direction, py.camera_direction, atol=1e-6)
    assert np.isclose(nat.camera_focal_length, py.camera_focal_length)
    assert nat.textures.shape == py.textures.shape
    assert (nat.textures == py.textures).all()


def test_triangle_scene():
    _compare(scenes.triangle_scene_glb())


def test_cube_scene():
    _compare(scenes.cube_scene_glb())


def test_dielectric_scene():
    _compare(scenes.dielectric_scene_glb(subdiv=1))


def test_textured_scene():
    _compare(scenes.textured_scene_glb())


def test_global_scale():
    _compare(scenes.cube_scene_glb(), global_scale=(2.0, 0.5, 1.0))


def test_procedural_sponza():
    from sycl_ray_tracer_tpu.utils.procgen import sponza_like_glb

    _compare(sponza_like_glb(scale=1))


def test_truncated_glb_is_rejected_not_oob():
    # regression (ADVICE round 1): a truncated BIN chunk used to pass
    # the start-offset-only check and read out of bounds. The native
    # loader must now reject it (accessor range validated against the
    # BIN length) instead of segfaulting.
    full = scenes.cube_scene_glb()
    # chop the tail of the BIN chunk but keep the JSON chunk intact:
    # the JSON chunk comes first, so removing trailing bytes truncates
    # vertex/index data while the accessors still promise full counts
    truncated = full[: len(full) - 256]
    with pytest.raises(ValueError, match="accessor|parse|BIN|JSON"):
        native_loader.load_glb_native(truncated)


def test_reference_assets():
    import os

    for name in ("triangle", "cube"):
        p = f"/root/reference/assets/{name}.glb"
        if os.path.exists(p):
            with open(p, "rb") as f:
                _compare(f.read())
