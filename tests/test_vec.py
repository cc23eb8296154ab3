"""Vector math parity with util.hpp semantics."""

import numpy as np
import jax.numpy as jnp

from sycl_ray_tracer_tpu.ops.vec import (V3, cross, dot, linear_to_gamma,
                                         near_zero, normalize, reflect,
                                         refract)


def _v(x, y, z):
    return V3(jnp.float32(x), jnp.float32(y), jnp.float32(z))


def test_reflect():
    # 45-degree mirror: (1,-1,0) off n=(0,1,0) -> (1,1,0)
    r = reflect(_v(1, -1, 0), _v(0, 1, 0))
    assert np.allclose([r.x, r.y, r.z], [1, 1, 0])


def test_refract_straight_through():
    # normal incidence, eta=1 -> unchanged
    d = normalize(_v(0, -1, 0))
    r = refract(d, _v(0, 1, 0), jnp.float32(1.0))
    assert np.allclose([r.x, r.y, r.z], [0, -1, 0], atol=1e-6)


def test_refract_snell():
    # 45 deg incidence, eta = 1/1.5: sin(theta_t) = sin(45)/1.5
    d = normalize(_v(1, -1, 0))
    r = refract(d, _v(0, 1, 0), jnp.float32(1 / 1.5))
    sin_t = float(r.x) / np.sqrt(float(r.x) ** 2 + float(r.y) ** 2)
    assert np.isclose(sin_t, np.sin(np.pi / 4) / 1.5, atol=1e-6)


def test_near_zero_and_gamma():
    assert bool(near_zero(_v(1e-9, -1e-9, 0)))
    assert not bool(near_zero(_v(1e-7, 0, 0)))
    assert np.isclose(float(linear_to_gamma(jnp.float32(0.25))), 0.5)
    assert float(linear_to_gamma(jnp.float32(-1.0))) == 0.0


def test_cross_dot():
    c = cross(_v(1, 0, 0), _v(0, 1, 0))
    assert np.allclose([c.x, c.y, c.z], [0, 0, 1])
    assert float(dot(_v(1, 2, 3), _v(4, 5, 6))) == 32.0
