"""Pallas packet-traversal kernel: interpret-mode equivalence with the
XLA traversal and brute force (the real-hardware path is exercised by
bench.py on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sycl_ray_tracer_tpu.ops import wbvh
from sycl_ray_tracer_tpu.ops.intersect import intersect_brute_np
from sycl_ray_tracer_tpu.ops.vec import V3


def _traverse_interpret(children, leaves, ni, depth, k, o, d, active=None):
    import sycl_ray_tracer_tpu.ops.traverse_pallas as TP
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    TP.pl.pallas_call = patched
    try:
        return TP.traverse_packets(children, leaves, ni, depth, k, o, d,
                                   active=active)
    finally:
        TP.pl.pallas_call = orig


def test_packet_kernel_matches_brute(rs):
    n, k = 1500, 8
    c = rs.uniform(-5, 5, (n, 3)).astype(np.float32)
    tri = c[:, None, :] + rs.uniform(-0.3, 0.3, (n, 3, 3)).astype(np.float32)
    depth, ni, _, _ = wbvh.plan(n, k)
    bvh, sorted_v, _ = jax.jit(lambda t: wbvh.build(t, k))(jnp.asarray(tri))

    r = 2048
    o_np = rs.uniform(-8, 8, (r, 3)).astype(np.float32)
    d_np = rs.uniform(-1, 1, (r, 3)).astype(np.float32)
    o = V3(*(jnp.asarray(o_np[:, i]) for i in range(3)))
    d = V3(*(jnp.asarray(d_np[:, i]) for i in range(3)))

    hit = _traverse_interpret(bvh.children, bvh.leaves, ni, depth, k, o, d)
    t_b, id_b, _, _ = intersect_brute_np(o_np, d_np, np.asarray(sorted_v))
    id1 = np.asarray(hit.tri)
    t1 = np.asarray(hit.t)
    assert ((id1 >= 0) == (id_b >= 0)).all()
    both = id1 >= 0
    assert (id1[both] == id_b[both]).all()
    assert np.allclose(t1[both], t_b[both], rtol=1e-5, atol=1e-6)


def _traverse2_interpret(ct, lt, ni, k, o, d, active=None, rows=2):
    import sycl_ray_tracer_tpu.ops.traverse_pallas2 as TP2
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    TP2.pl.pallas_call = patched
    try:
        return TP2.traverse_packets2(ct, lt, ni, k, o, d,
                                     active=active, rows=rows)
    finally:
        TP2.pl.pallas_call = orig


def _tiles_for(bvh, k):
    ids = wbvh.heap_child_ids_np(bvh.num_internal)
    ct, lt = wbvh.pack_tiles_np(np.asarray(bvh.children), ids,
                                np.asarray(bvh.leaves), k)
    return jnp.asarray(ct), jnp.asarray(lt)


@pytest.mark.parametrize("rows", [1, 2, 8])
def test_packet_kernel2_matches_brute(rs, rows):
    n, k = 1500, 8
    c = rs.uniform(-5, 5, (n, 3)).astype(np.float32)
    tri = c[:, None, :] + rs.uniform(-0.3, 0.3, (n, 3, 3)).astype(np.float32)
    bvh, sorted_v, _ = wbvh.build_np(tri, k)
    ct, lt = _tiles_for(bvh, k)

    r = 1500  # not a packet multiple: exercises padding
    o_np = rs.uniform(-8, 8, (r, 3)).astype(np.float32)
    d_np = rs.uniform(-1, 1, (r, 3)).astype(np.float32)
    o = V3(*(jnp.asarray(o_np[:, i]) for i in range(3)))
    d = V3(*(jnp.asarray(d_np[:, i]) for i in range(3)))

    hit = _traverse2_interpret(ct, lt, bvh.num_internal, k, o, d,
                               rows=rows)
    t_b, id_b, _, _ = intersect_brute_np(o_np, d_np, np.asarray(sorted_v))
    id1 = np.asarray(hit.tri)
    t1 = np.asarray(hit.t)
    assert ((id1 >= 0) == (id_b >= 0)).all()
    both = id1 >= 0
    assert (id1[both] == id_b[both]).all()
    assert np.allclose(t1[both], t_b[both], rtol=1e-5, atol=1e-6)


def test_packet_kernel2_active_mask(rs):
    n, k = 300, 8
    c = rs.uniform(-2, 2, (n, 3)).astype(np.float32)
    tri = c[:, None, :] + rs.uniform(-0.3, 0.3, (n, 3, 3)).astype(np.float32)
    tri[0] = np.array([[-1, -1, 0], [1, -1, 0], [0, 1, 0]], np.float32)
    bvh, _, _ = wbvh.build_np(tri, k)
    ct, lt = _tiles_for(bvh, k)

    r = 1024
    o = V3(jnp.zeros(r), jnp.zeros(r), jnp.full(r, 8.0))
    d = V3(jnp.zeros(r), jnp.zeros(r), jnp.full(r, -1.0))
    active = jnp.asarray(np.arange(r) % 2 == 0)
    hit = _traverse2_interpret(ct, lt, bvh.num_internal, k, o, d,
                               active=active)
    tri_ids = np.asarray(hit.tri)
    assert (tri_ids[1::2] == -1).all()
    assert (tri_ids[0::2] >= 0).all()
    assert (np.asarray(hit.t)[1::2] == 0).all()


def test_build_np_matches_jit_build(rs):
    n, k = 700, 8
    c = rs.uniform(-5, 5, (n, 3)).astype(np.float32)
    tri = c[:, None, :] + rs.uniform(-0.3, 0.3, (n, 3, 3)).astype(np.float32)
    b_np, sv_np, _ = wbvh.build_np(tri, k)
    b_j, sv_j, _ = jax.jit(lambda t: wbvh.build(t, k))(jnp.asarray(tri))
    assert b_np.num_internal == b_j.num_internal
    assert b_np.depth == b_j.depth
    assert (b_np.order == np.asarray(b_j.order)).all()
    assert np.allclose(b_np.nodes, np.asarray(b_j.nodes))
    assert np.allclose(b_np.children, np.asarray(b_j.children))
    assert np.allclose(b_np.leaves, np.asarray(b_j.leaves))


def test_packet_kernel_active_mask(rs):
    n, k = 300, 8
    c = rs.uniform(-2, 2, (n, 3)).astype(np.float32)
    tri = c[:, None, :] + rs.uniform(-0.3, 0.3, (n, 3, 3)).astype(np.float32)
    # one guaranteed target square on the z axis
    tri[0] = np.array([[-1, -1, 0], [1, -1, 0], [0, 1, 0]], np.float32)
    depth, ni, _, _ = wbvh.plan(n, k)
    bvh, _, _ = jax.jit(lambda t: wbvh.build(t, k))(jnp.asarray(tri))

    r = 1024
    o = V3(jnp.zeros(r), jnp.zeros(r), jnp.full(r, 8.0))
    d = V3(jnp.zeros(r), jnp.zeros(r), jnp.full(r, -1.0))
    active = jnp.asarray(np.arange(r) % 2 == 0)
    hit = _traverse_interpret(bvh.children, bvh.leaves, ni, depth, k, o, d,
                              active=active)
    tri_ids = np.asarray(hit.tri)
    assert (tri_ids[1::2] == -1).all()          # inactive lanes untouched
    assert (tri_ids[0::2] >= 0).all()           # active lanes hit


def test_bf16_directed_rounding():
    """pack_ctiles_bf16_np bounds: lo rounds toward -inf, hi toward
    +inf, exactly one bf16 ulp at most, infinities preserved."""
    from sycl_ray_tracer_tpu.ops.wbvh import _bf16_dir_bits

    x = np.float32([1.0, 1.0000001, -1.0000001, 0.0, -0.0,
                    3.0e38, -3.0e38, 1e-30, -1e-30, 127.9999])
    lo = _bf16_dir_bits(x, up=False).view(np.float32)
    hi = _bf16_dir_bits(x, up=True).view(np.float32)
    assert (lo <= x).all() and (hi >= x).all()
    # exact bf16 values pass through unchanged
    exact = np.float32([1.0, 0.0, -0.0, 2.5, -128.0])
    for arr in (_bf16_dir_bits(exact, up=False),
                _bf16_dir_bits(exact, up=True)):
        assert (arr.view(np.float32) == exact).all()
    # error bounded by one bf16 ulp (relative 2^-7)
    fin = np.isfinite(lo) & np.isfinite(hi) & (np.abs(x) > 0)
    rel = (hi[fin] - lo[fin]) / np.abs(x[fin])
    assert rel.max() <= 2.0 ** -6


def test_v5_bf16p_matches_f32_tiles():
    """The bf16-packed node format must produce the same hits as the
    f32 tiles (boxes only widen; closest-hit is unchanged)."""
    import jax.numpy as jnp

    from sycl_ray_tracer_tpu.ops import wbvh as W
    from sycl_ray_tracer_tpu.ops.vec import V3

    rng = np.random.default_rng(11)
    n = 3000
    c = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.5, (n, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.5, (n, 3)).astype(np.float32)
    tri_v = np.stack([c, c + e1, c + e2], axis=1)
    bvh, _, _ = W.build_np(tri_v, 8)
    ids = W.heap_child_ids_np(bvh.num_internal)
    ct32, lt = W.pack_tiles_np(np.asarray(bvh.children), ids,
                               np.asarray(bvh.leaves), 8)
    ctb = W.pack_ctiles_bf16_np(np.asarray(bvh.children), ids)

    r = 1024
    o_np = rng.uniform(-6, 6, (r, 3)).astype(np.float32)
    d_np = rng.normal(0, 1, (r, 3)).astype(np.float32)
    o = V3(*[jnp.asarray(o_np[:, i]) for i in range(3)])
    d = V3(*[jnp.asarray(d_np[:, i]) for i in range(3)])

    h32 = _traverse5_interpret(jnp.asarray(ct32), jnp.asarray(lt),
                               bvh.num_internal, 8, o, d, cfmt="f32")
    hbf = _traverse5_interpret(jnp.asarray(ctb), jnp.asarray(lt),
                               bvh.num_internal, 8, o, d, cfmt="bf16p")
    assert (np.asarray(h32.tri) == np.asarray(hbf.tri)).all()
    assert np.allclose(np.asarray(h32.t), np.asarray(hbf.t),
                       rtol=1e-6, atol=1e-6, equal_nan=True)


def _traverse5_interpret(ct, lt, ni, k, o, d, cfmt="f32"):
    import sycl_ray_tracer_tpu.ops.traverse_pallas5 as TP5
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    TP5.pl.pallas_call = patched
    try:
        return TP5.traverse_packets5(ct, lt, ni, k, o, d, cfmt=cfmt)
    finally:
        TP5.pl.pallas_call = orig


def test_v5_leaf_ring_overflow_guard(rs):
    """Stress the SMEM leaf-ring occupancy guard (round-2 advisor
    finding: without gating, a pending-leaf backlog beyond ring
    capacity silently overwrites unprocessed leaf ids and drops
    intersections).

    The scene is built to defeat slab culling: long sliver triangles
    spanning the whole extent make every node's AABB cover everything,
    so EVERY leaf is enqueued while only ml drain per iteration. With
    the ring shrunk to 256 slots (monkeypatched _LQ), ~750 leaves of
    pending backlog must hit the guard (ungated peak pending would be
    ~640); correctness then proves gated drain-only iterations resume
    the walk without losing leaves. Sliver hits are dense enough that
    a wrapped ring would visibly corrupt closest hits vs brute force.
    """
    import sycl_ray_tracer_tpu.ops.traverse_pallas5 as TP5

    n, k = 6000, 8
    c = rs.uniform(-4, 4, (n, 3)).astype(np.float32)
    e1 = rs.normal(0, 1, (n, 3)).astype(np.float32)
    e1 /= np.linalg.norm(e1, axis=1, keepdims=True)
    e1 *= 8.0  # long edge spans the scene -> giant overlapping AABBs
    e2 = rs.normal(0, 0.05, (n, 3)).astype(np.float32)
    tri = np.stack([c - 0.5 * e1, c + 0.5 * e1, c + e2], axis=1)
    bvh, sorted_v, _ = wbvh.build_np(tri, k)
    assert bvh.leaves.shape[0] >= 700  # the backlog the test needs
    ct, lt = _tiles_for(bvh, k)

    r = 1024  # one packet: all rays share one walk and one ring
    o_np = rs.uniform(-8, 8, (r, 3)).astype(np.float32)
    tgt = rs.uniform(-2, 2, (r, 3)).astype(np.float32)
    d_np = (tgt - o_np).astype(np.float32)
    o = V3(*(jnp.asarray(o_np[:, i]) for i in range(3)))
    d = V3(*(jnp.asarray(d_np[:, i]) for i in range(3)))

    orig_lq = TP5._LQ
    orig_call = TP5.pl.pallas_call

    def patched(*a, **kw):
        kw["interpret"] = True
        return orig_call(*a, **kw)

    TP5._LQ = 256
    TP5.pl.pallas_call = patched
    try:
        hit = TP5.traverse_packets5(ct, lt, bvh.num_internal, k, o, d)
    finally:
        TP5._LQ = orig_lq
        TP5.pl.pallas_call = orig_call

    t_b, id_b, _, _ = intersect_brute_np(o_np, d_np, np.asarray(sorted_v))
    id1 = np.asarray(hit.tri)
    t1 = np.asarray(hit.t)
    assert (id_b >= 0).mean() > 0.9  # the stress is real: dense hits
    assert ((id1 >= 0) == (id_b >= 0)).all()
    both = id1 >= 0
    assert (id1[both] == id_b[both]).all()
    # sliver triangles make the MT determinant ill-conditioned, so t
    # carries more float noise than the compact-triangle tests; the
    # exact id equality above is the correctness claim
    assert np.allclose(t1[both], t_b[both], rtol=1e-3, atol=1e-4)


def test_v8_batched_mxu_drain_interpret():
    """v8 (slab-only walk + batched Woop drains,
    ops/traverse_pallas8.py) in interpret mode vs the brute-force
    woop reference: exact tri ids and float-level t/u/v on the cube
    fixture, plus t_init chaining semantics (only strictly-closer
    hits reported). Interpret mode runs true f32 — the real-TPU
    requirement that the dot use precision=HIGHEST (the MXU's default
    f32 dot is one bf16 pass) is documented in the kernel and was
    verified on hardware (PLAN_TPU round-5 facts)."""
    import sycl_ray_tracer_tpu.ops.traverse_pallas8 as TP8
    from sycl_ray_tracer_tpu.ops import sah, woop
    from sycl_ray_tracer_tpu.utils.fixtures import cube_scene_glb
    from sycl_ray_tracer_tpu.utils.gltf import load_glb

    host = load_glb(cube_scene_glb())
    sahb = sah.build_sah(host.tri_v, 8)
    if sahb is None:
        import pytest
        pytest.skip("native SAH library unavailable")
    rows = sah.leaf_rows(host.tri_v, sahb.order, 8)
    ct, lt = wbvh.pack_tiles_np(sahb.children, sahb.child_ids, rows, 8)
    wt = woop.pack_wtiles_affine_np(rows)

    rs = np.random.RandomState(3)
    r = 1024
    o_np = np.broadcast_to(
        np.asarray(host.camera_position, np.float32), (r, 3)).copy()
    d_np = rs.randn(r, 3).astype(np.float32)
    d_np /= np.linalg.norm(d_np, axis=1, keepdims=True)
    o = V3(*(jnp.asarray(o_np[:, i]) for i in range(3)))
    d = V3(*(jnp.asarray(d_np[:, i]) for i in range(3)))

    orig_call = TP8.pl.pallas_call

    def patched(*a, **kw):
        kw["interpret"] = True
        return orig_call(*a, **kw)

    TP8.pl.pallas_call = patched
    try:
        hit = TP8.traverse_packets8(jnp.asarray(ct), jnp.asarray(wt),
                                    sahb.num_internal, 8, o, d)
        tw, jw, uw, vw = woop.np_woop_hit(rows, o_np, d_np)
        miss_ref = ~np.isfinite(tw)
        tri8 = np.asarray(hit.tri)
        assert ((tri8 < 0) == miss_ref).all()
        both = ~miss_ref
        assert (tri8[both] == jw[both]).all()
        assert np.allclose(np.asarray(hit.t)[both], tw[both],
                           rtol=1e-4, atol=1e-5)
        assert np.allclose(np.asarray(hit.u)[both], uw[both], atol=1e-4)
        assert np.allclose(np.asarray(hit.v)[both], vw[both], atol=1e-4)

        # t_init chaining: with the incumbent at the found t, no
        # strictly-closer hit exists, so every ray reports tri=-1
        hit2 = TP8.traverse_packets8(
            jnp.asarray(ct), jnp.asarray(wt), sahb.num_internal, 8,
            o, d, t_init=hit.t)
        assert (np.asarray(hit2.tri) == -1).all()
    finally:
        TP8.pl.pallas_call = orig_call
