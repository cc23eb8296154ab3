"""LBVH build invariants + traversal equivalence with brute force."""

import numpy as np
import jax.numpy as jnp

from sycl_ray_tracer_tpu.ops import lbvh
from sycl_ray_tracer_tpu.ops.intersect import intersect_brute_np
from sycl_ray_tracer_tpu.ops.traverse import traverse
from sycl_ray_tracer_tpu.ops.vec import V3


def _random_tris(rs, n, spread=5.0, size=0.3):
    c = rs.uniform(-spread, spread, (n, 3)).astype(np.float32)
    return c[:, None, :] + rs.uniform(-size, size, (n, 3, 3)).astype(
        np.float32)


def test_build_invariants(rs):
    tri = _random_tris(rs, 1000)
    bvh, sorted_v, valid = lbvh.build(jnp.asarray(tri), leaf_size=4)
    assert bvh.num_leaves == lbvh.next_pow2(-(-1000 // 4))
    lbvh.validate(bvh, np.asarray(sorted_v), np.asarray(valid))
    # every input triangle appears exactly once
    order = np.asarray(bvh.order)
    real = order[order >= 0]
    assert sorted(real.tolist()) == list(range(1000))


def test_morton_locality():
    # points along a line sort monotonically
    p = np.stack([np.linspace(0, 1, 64)] * 3, axis=1).astype(np.float32)
    codes = np.asarray(lbvh.morton30(jnp.asarray(p),
                                     jnp.zeros(3), jnp.ones(3)))
    assert (np.diff(codes.astype(np.int64)) >= 0).all()


def test_traversal_matches_brute(rs):
    for n, k in [(37, 4), (1000, 4), (1000, 8)]:
        tri = _random_tris(rs, n)
        bvh, sorted_v, _ = lbvh.build(jnp.asarray(tri), leaf_size=k)
        v0 = sorted_v[:, 0, :]
        e1 = sorted_v[:, 1, :] - sorted_v[:, 0, :]
        e2 = sorted_v[:, 2, :] - sorted_v[:, 0, :]

        r = 2000
        o_np = rs.uniform(-8, 8, (r, 3)).astype(np.float32)
        d_np = rs.uniform(-1, 1, (r, 3)).astype(np.float32)
        o = V3(*(jnp.asarray(o_np[:, i]) for i in range(3)))
        d = V3(*(jnp.asarray(d_np[:, i]) for i in range(3)))
        hit = traverse(bvh.node_lo, bvh.node_hi, v0, e1, e2, o, d, k)

        t_b, id_b, u_b, v_b = intersect_brute_np(
            o_np, d_np, np.asarray(sorted_v))
        t1 = np.asarray(hit.t)
        id1 = np.asarray(hit.tri)
        assert ((id1 >= 0) == (id_b >= 0)).all()
        both = (id1 >= 0)
        assert np.allclose(t1[both], t_b[both], rtol=1e-5, atol=1e-6)
        assert (id1[both] == id_b[both]).all()


def test_inactive_lanes_skip(rs):
    tri = _random_tris(rs, 256)
    bvh, sorted_v, _ = lbvh.build(jnp.asarray(tri), leaf_size=4)
    v0 = sorted_v[:, 0, :]
    e1 = sorted_v[:, 1, :] - sorted_v[:, 0, :]
    e2 = sorted_v[:, 2, :] - sorted_v[:, 0, :]
    o = V3(jnp.zeros(8), jnp.zeros(8), jnp.full(8, 10.0))
    d = V3(jnp.zeros(8), jnp.zeros(8), jnp.full(8, -1.0))
    active = jnp.asarray([True, False] * 4)
    hit = traverse(bvh.node_lo, bvh.node_hi, v0, e1, e2, o, d, 4,
                   active_in=active)
    assert (np.asarray(hit.tri)[~np.asarray(active)] == -1).all()


def test_empty_and_tiny_scene():
    tri = jnp.zeros((0, 3, 3), jnp.float32)
    bvh, sorted_v, valid = lbvh.build(tri, leaf_size=4)
    assert not bool(np.asarray(valid).any())
    tri1 = jnp.asarray(
        np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32))
    bvh1, sv1, _ = lbvh.build(tri1, leaf_size=4)
    o = V3(jnp.asarray([0.2]), jnp.asarray([0.2]), jnp.asarray([5.0]))
    d = V3(jnp.asarray([0.0]), jnp.asarray([0.0]), jnp.asarray([-1.0]))
    hit = traverse(bvh1.node_lo, bvh1.node_hi,
                   sv1[:, 0, :], sv1[:, 1, :] - sv1[:, 0, :],
                   sv1[:, 2, :] - sv1[:, 0, :], o, d, 4)
    assert int(hit.tri[0]) == 0
    assert np.isclose(float(hit.t[0]), 5.0, atol=1e-5)
