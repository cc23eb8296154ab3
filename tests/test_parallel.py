"""Multi-chip sharding on the 8-device virtual CPU mesh: the sharded
estimator must equal the single-device render exactly (same sample
indices, same keys, just partitioned)."""

import jax
import numpy as np
import pytest

from sycl_ray_tracer_tpu.models.megakernel import render_megakernel
from sycl_ray_tracer_tpu.models.oracle import rmse
from sycl_ray_tracer_tpu.models.wavefront import render_wavefront
from sycl_ray_tracer_tpu.parallel.mesh import make_mesh, render_sharded

from tests import scenes

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def test_sample_sharding_matches_single_device():
    scene, host, cam = scenes.load_pair(scenes.cube_scene_glb(), 32, 32)
    single, rays1 = render_wavefront(scene, cam, width=32, height=32,
                                     spp=8, max_depth=6, seed=0)
    mesh = make_mesh(dp=8, sp=1)
    sharded, rays8 = render_sharded(scene, cam, width=32, height=32,
                                    spp=8, max_depth=6, seed=0, mesh=mesh)
    assert rmse(np.asarray(single), np.asarray(sharded)) < 1e-6
    assert np.asarray(rays1).sum() == np.asarray(rays8).sum()


def test_2d_mesh_samples_x_pixels():
    scene, host, cam = scenes.load_pair(scenes.cube_scene_glb(), 32, 32)
    single, rays1 = render_wavefront(scene, cam, width=32, height=32,
                                     spp=4, max_depth=6, seed=0)
    mesh = make_mesh(dp=4, sp=2)
    sharded, rays = render_sharded(scene, cam, width=32, height=32,
                                   spp=4, max_depth=6, seed=0, mesh=mesh)
    assert rmse(np.asarray(single), np.asarray(sharded)) < 1e-6
    assert np.asarray(rays1).sum() == np.asarray(rays).sum()


def test_pixel_only_sharding_megakernel():
    scene, host, cam = scenes.load_pair(scenes.triangle_scene_glb(), 32, 32)
    single, _ = render_megakernel(scene, cam, width=32, height=32,
                                  spp=2, max_depth=4, seed=0)
    mesh = make_mesh(dp=1, sp=8)
    sharded, _ = render_sharded(scene, cam, width=32, height=32,
                                spp=2, max_depth=4, seed=0, mesh=mesh,
                                renderer="megakernel")
    assert rmse(np.asarray(single), np.asarray(sharded)) < 1e-6
