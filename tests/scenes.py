"""Test-local alias for the package fixture scenes."""

from sycl_ray_tracer_tpu.utils.fixtures import (  # noqa: F401
    _icosphere,
    _quad,
    cube_scene_glb,
    dielectric_scene_glb,
    load_pair,
    textured_scene_glb,
    triangle_scene_glb,
)
