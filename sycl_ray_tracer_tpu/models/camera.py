"""Pinhole camera + jittered primary-ray generation.

Parity target: camera.hpp:74-131. Basis from world_up (0,1,0), viewport
height fixed at 1.0, width = aspect; focal length comes from glTF yfov
as 1/tan(yfov/2) (scene.cpp:127). Primary ray directions are
*unnormalized* (pixel_sample - center), exactly like the reference —
t values stay in those units throughout.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from sycl_ray_tracer_tpu.ops import rng as _rng
from sycl_ray_tracer_tpu.ops.vec import V3


class Camera(NamedTuple):
    center: jnp.ndarray       # [3]
    pixel00: jnp.ndarray      # [3] viewport top-left corner point
    delta_u: jnp.ndarray      # [3] per-pixel step along +x
    delta_v: jnp.ndarray      # [3] per-pixel step along +y (downward)
    width: int
    height: int


def make_camera(width: int, height: int, position, direction,
                focal_length: float) -> Camera:
    """camera.hpp:74-106, reimplemented with numpy at setup time."""
    pos = np.asarray(position, np.float64)
    d = np.asarray(direction, np.float64)
    d = d / max(np.linalg.norm(d), 1e-20)
    world_up = np.array([0.0, 1.0, 0.0])
    right = np.cross(d, world_up)
    right = right / max(np.linalg.norm(right), 1e-20)
    up = np.cross(right, d)
    up = up / max(np.linalg.norm(up), 1e-20)

    vw = float(width) / float(height)
    vh = 1.0
    viewport_u = -right * vw
    viewport_v = up * vh
    pixel00 = pos + viewport_u + viewport_v + d * focal_length
    delta_u = right * (2.0 * vw / width)
    delta_v = -up * (2.0 * vh / height)
    return Camera(
        center=jnp.asarray(pos, jnp.float32),
        pixel00=jnp.asarray(pixel00, jnp.float32),
        delta_u=jnp.asarray(delta_u, jnp.float32),
        delta_v=jnp.asarray(delta_v, jnp.float32),
        width=int(width), height=int(height),
    )


def generate_rays(cam: Camera, px: jnp.ndarray, py: jnp.ndarray,
                  key: jnp.ndarray):
    """Jittered rays for integer pixel coords (camera.hpp:109-131).
    Jitter uses RNG counters 0 and 1. Returns (o, d) as V3 of [R]."""
    jx = _rng.uniform(key, 0) - 0.5
    jy = _rng.uniform(key, 1) - 0.5
    fx = px.astype(jnp.float32) + jx
    fy = py.astype(jnp.float32) + jy

    def axis(i):
        return (cam.pixel00[i]
                + fx * cam.delta_u[i]
                + fy * cam.delta_v[i]
                - cam.center[i])

    d = V3(axis(0), axis(1), axis(2))
    r = px.shape[0]
    o = V3(jnp.broadcast_to(cam.center[0], (r,)),
           jnp.broadcast_to(cam.center[1], (r,)),
           jnp.broadcast_to(cam.center[2], (r,)))
    return o, d


def generate_rays_np(cam, px, py, key):
    """numpy twin for the oracle (bit-identical jitter)."""
    c = np.asarray(cam.center, np.float32)
    p00 = np.asarray(cam.pixel00, np.float32)
    du = np.asarray(cam.delta_u, np.float32)
    dv = np.asarray(cam.delta_v, np.float32)
    jx = _rng.uniform_np(key, 0) - np.float32(0.5)
    jy = _rng.uniform_np(key, 1) - np.float32(0.5)
    fx = px.astype(np.float32) + jx
    fy = py.astype(np.float32) + jy
    d = p00[None, :] + fx[:, None] * du[None, :] + fy[:, None] * dv[None, :] - c
    o = np.broadcast_to(c, d.shape).copy()
    return o.astype(np.float32), d.astype(np.float32)
