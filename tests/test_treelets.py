"""Treelet decomposition (ops/treelets.py): partition invariants and
interpret-mode equivalence of the chained-pass traversal against the
single-tree XLA traversal.

The production path (models/trace.py:_intersect_treelets) runs one v5
Pallas pass per treelet chained through t_init; here the same code runs
with pallas interpret=True on CPU so correctness is gated in CI without
TPU hardware (the same technique as tests/test_pallas.py)."""

import numpy as np
import pytest

from sycl_ray_tracer_tpu.ops import treelets as TL


def _scene_tris(n=5000, seed=0):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.4, (n, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.4, (n, 3)).astype(np.float32)
    return np.stack([c, c + e1, c + e2], axis=1)


def test_partition_invariants():
    tri_v = _scene_tris(5000)
    chunks = TL.partition(tri_v, 700)
    # disjoint cover of all triangle ids
    allids = np.concatenate(chunks)
    assert len(allids) == 5000
    assert len(np.unique(allids)) == 5000
    assert all(len(c) <= 700 for c in chunks)
    # balanced: median split cannot produce off-by-2x chunks
    sizes = [len(c) for c in chunks]
    assert max(sizes) <= 2 * min(sizes)


def test_build_treelets_tables():
    tri_v = _scene_tris(3000)
    inv_morton = np.arange(3000, dtype=np.int32)  # identity canonical
    tl = TL.build_treelets(tri_v, inv_morton, leaf_size=8,
                           max_tris=1000)
    assert tl.count >= 3
    assert tl.ctiles.shape[0] == tl.count
    # every triangle id appears exactly once across treelet remaps
    ids = tl.remap[tl.remap >= 0]
    assert len(ids) == 3000
    assert len(np.unique(ids)) == 3000
    # root bounds cover the chunk geometry
    assert (tl.lo.min(axis=0) <= tri_v.reshape(-1, 3).min(axis=0)
            + 1e-4).all()
    assert (tl.hi.max(axis=0) >= tri_v.reshape(-1, 3).max(axis=0)
            - 1e-4).all()


def _interpret_treelet_hit(scene, o, d, active=None, primary=False):
    """Run trace._intersect_treelets with pallas forced to interpret."""
    import sycl_ray_tracer_tpu.ops.traverse_pallas5 as TP5
    from sycl_ray_tracer_tpu.models import trace as _trace

    orig = TP5.pl.pallas_call

    def patched(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    TP5.pl.pallas_call = patched
    try:
        return _trace._intersect_treelets(scene, o, d, active, primary)
    finally:
        TP5.pl.pallas_call = orig


@pytest.mark.parametrize("seed,tl_bin", [(0, False), (3, False),
                                         (0, True)])
def test_treelet_traversal_matches_single_tree(monkeypatch, seed,
                                               tl_bin):
    import jax.numpy as jnp

    from sycl_ray_tracer_tpu.models.scene import build_device_scene
    from sycl_ray_tracer_tpu.ops.vec import V3
    from sycl_ray_tracer_tpu.ops.wbvh import traverse8
    from sycl_ray_tracer_tpu.utils.fixtures import load_pair
    from sycl_ray_tracer_tpu.utils.gltf import load_glb
    from sycl_ray_tracer_tpu.utils.procgen import sponza_like_glb

    # force the treelet path on a small scene: ~22K tris, ~6 treelets
    monkeypatch.setenv("SRT_TREELET_THRESHOLD_TRIS", "1000")
    monkeypatch.setenv("SRT_TREELET_MAX_TRIS", "4096")
    # cover the optional ray-binning variant (off by default; the
    # bin permute + NaN-safe int encoding must be result-invariant)
    from sycl_ray_tracer_tpu.models import trace as _trace
    monkeypatch.setattr(_trace, "TL_BIN", tl_bin)
    host = load_glb(sponza_like_glb(scale=1))
    scene = build_device_scene(host, leaf_size=8)
    assert scene.tl_count >= 4

    rng = np.random.default_rng(seed)
    r = 2048
    lo = host.tri_v.reshape(-1, 3).min(axis=0)
    hi = host.tri_v.reshape(-1, 3).max(axis=0)
    o_np = rng.uniform(lo - 1, hi + 1, (r, 3)).astype(np.float32)
    d_np = rng.normal(0, 1, (r, 3)).astype(np.float32)
    o = V3(*[jnp.asarray(o_np[:, i]) for i in range(3)])
    d = V3(*[jnp.asarray(d_np[:, i]) for i in range(3)])

    hit_tl = _interpret_treelet_hit(scene, o, d)
    hit_ref = traverse8(scene.bvh_nodes, scene.bvh_ni, scene.bvh_depth,
                        scene.leaf_size, o, d)

    tri_a = np.asarray(hit_tl.tri)
    tri_b = np.asarray(hit_ref.tri)
    t_a = np.asarray(hit_tl.t)
    t_b = np.asarray(hit_ref.t)
    # same hit/miss classification everywhere
    assert ((tri_a >= 0) == (tri_b >= 0)).all()
    both = tri_a >= 0
    # same distance; ids may differ only on exact-tie overlapping tris
    # (shared quad edges hit at identical t — different trees break
    # the tie differently; ~0.3% of hits on this scene)
    assert np.allclose(t_a[both], t_b[both], rtol=1e-5, atol=1e-5)
    assert (tri_a[both] == tri_b[both]).mean() > 0.99


def test_treelet_active_mask_and_chaining(monkeypatch):
    """Inactive lanes stay misses; t_init chaining never loses the
    closer hit when a nearer treelet is processed first or last."""
    import jax.numpy as jnp

    from sycl_ray_tracer_tpu.models.scene import build_device_scene
    from sycl_ray_tracer_tpu.ops.vec import V3
    from sycl_ray_tracer_tpu.ops.wbvh import traverse8
    from sycl_ray_tracer_tpu.utils.gltf import load_glb
    from sycl_ray_tracer_tpu.utils.procgen import sponza_like_glb

    monkeypatch.setenv("SRT_TREELET_THRESHOLD_TRIS", "1000")
    monkeypatch.setenv("SRT_TREELET_MAX_TRIS", "4096")
    host = load_glb(sponza_like_glb(scale=1))
    scene = build_device_scene(host, leaf_size=8)

    rng = np.random.default_rng(7)
    r = 1024
    lo = host.tri_v.reshape(-1, 3).min(axis=0)
    hi = host.tri_v.reshape(-1, 3).max(axis=0)
    o_np = rng.uniform(lo, hi, (r, 3)).astype(np.float32)
    d_np = rng.normal(0, 1, (r, 3)).astype(np.float32)
    o = V3(*[jnp.asarray(o_np[:, i]) for i in range(3)])
    d = V3(*[jnp.asarray(d_np[:, i]) for i in range(3)])
    act = jnp.asarray(np.arange(r) % 3 != 0)

    hit = _interpret_treelet_hit(scene, o, d, active=act)
    assert (np.asarray(hit.tri)[~np.asarray(act)] == -1).all()
    ref = traverse8(scene.bvh_nodes, scene.bvh_ni, scene.bvh_depth,
                    scene.leaf_size, o, d, active_in=act)
    both = (np.asarray(hit.tri) >= 0) & np.asarray(act)
    assert np.allclose(np.asarray(hit.t)[both],
                       np.asarray(ref.t)[both], rtol=1e-5, atol=1e-5)
