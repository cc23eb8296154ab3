"""Ray-triangle intersection (Moller-Trumbore) and brute-force reference.

Replaces Embree's rtcIntersect1 (trace_ray.hpp:22) as the innermost hot
op. Conventions match Embree's as used by the reference:

- t is measured in units of the (possibly unnormalized) ray direction;
  the reference traces with unnormalized directions and tnear=1e-4
  (camera.hpp:46-62), so the t-range test uses raw parameter values.
- Barycentrics (u, v) weight vertices 1 and 2; w = 1-u-v weights vertex
  0 (trace_ray.hpp:48-55).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from sycl_ray_tracer_tpu.ops.vec import V3, cross, dot

TNEAR = 1e-4  # camera.hpp:51 (RTCRay.tnear)
_DET_EPS = 1e-12
# np scalar, not jnp: a module-level jnp constant would initialize the
# default JAX backend at import time, before callers can pick one.
BIG = np.float32(3.0e38)


class Hit(NamedTuple):
    t: jnp.ndarray       # [R] float32, BIG when miss
    tri: jnp.ndarray     # [R] int32, -1 when miss
    u: jnp.ndarray       # [R] float32
    v: jnp.ndarray       # [R] float32

    @property
    def mask(self) -> jnp.ndarray:
        return self.tri >= 0


def moller_trumbore(o: V3, d: V3, v0: V3, e1: V3, e2: V3,
                    t_max: jnp.ndarray):
    """Batched Moller-Trumbore.

    All args broadcast together; returns (hit_mask, t, u, v). Degenerate
    (zero-area padding) triangles produce det≈0 and are rejected.
    """
    pvec = cross(d, e2)
    det = dot(e1, pvec)
    inv_det = jnp.where(jnp.abs(det) > _DET_EPS, 1.0 / det, 0.0)
    tvec = o - v0
    u = dot(tvec, pvec) * inv_det
    qvec = cross(tvec, e1)
    v = dot(d, qvec) * inv_det
    t = dot(e2, qvec) * inv_det
    ok = (
        (jnp.abs(det) > _DET_EPS)
        & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t > TNEAR) & (t < t_max)
    )
    return ok, t, u, v


def intersect_brute(o: V3, d: V3, tri_v: jnp.ndarray,
                    chunk: int = 2048) -> Hit:
    """Test every ray against every triangle; the correctness oracle for
    BVH traversal and the intersector for tiny scenes.

    tri_v: [N, 3, 3]. Memory is bounded by looping triangle chunks.
    """
    n = tri_v.shape[0]
    r = o.x.shape[0]
    v0 = tri_v[:, 0, :]
    e1 = tri_v[:, 1, :] - tri_v[:, 0, :]
    e2 = tri_v[:, 2, :] - tri_v[:, 0, :]

    pad = (-n) % chunk
    if pad:
        z = jnp.zeros((pad, 3), v0.dtype)
        v0 = jnp.concatenate([v0, z])
        e1 = jnp.concatenate([e1, z])
        e2 = jnp.concatenate([e2, z])
    n_chunks = (n + pad) // chunk

    t_best = jnp.full((r,), BIG, jnp.float32)
    id_best = jnp.full((r,), -1, jnp.int32)
    u_best = jnp.zeros((r,), jnp.float32)
    v_best = jnp.zeros((r,), jnp.float32)

    ob = V3(o.x[:, None], o.y[:, None], o.z[:, None])
    db = V3(d.x[:, None], d.y[:, None], d.z[:, None])

    def chunk_body(c, carry):
        t_b, id_b, u_b, v_b = carry
        s = c * chunk
        idx = s + jnp.arange(chunk)
        cv0 = _rows(v0, idx)
        ce1 = _rows(e1, idx)
        ce2 = _rows(e2, idx)
        ok, t, u, v = moller_trumbore(ob, db, cv0, ce1, ce2, t_b[:, None])
        # also reject padded triangle slots
        ok = ok & (idx[None, :] < n)
        t = jnp.where(ok, t, BIG)
        k = jnp.argmin(t, axis=1)
        tk = jnp.take_along_axis(t, k[:, None], 1)[:, 0]
        better = tk < t_b
        sel = lambda arr: jnp.take_along_axis(arr, k[:, None], 1)[:, 0]
        return (
            jnp.where(better, tk, t_b),
            jnp.where(better, (s + k).astype(jnp.int32), id_b),
            jnp.where(better, sel(u), u_b),
            jnp.where(better, sel(v), v_b),
        )

    import jax
    t_best, id_best, u_best, v_best = jax.lax.fori_loop(
        0, n_chunks, chunk_body, (t_best, id_best, u_best, v_best))
    return Hit(t=t_best, tri=id_best, u=u_best, v=v_best)


def _rows(table: jnp.ndarray, idx: jnp.ndarray) -> V3:
    """Gather [*, 3] rows by any-shaped idx -> V3 with idx's shape
    broadcast against a leading ray axis of size 1."""
    g = jnp.take(table, idx, axis=0)
    return V3(g[..., 0][None, :], g[..., 1][None, :], g[..., 2][None, :])


# ---------------------------------------------------------------------
# numpy twin for the CPU oracle (bit-compatible semantics, not speed)
# ---------------------------------------------------------------------

def intersect_brute_np(o: np.ndarray, d: np.ndarray, tri_v: np.ndarray,
                       t_max=None):
    """o, d: [R, 3]; tri_v: [N, 3, 3] -> (t, tri, u, v)."""
    r = o.shape[0]
    n = tri_v.shape[0]
    v0 = tri_v[None, :, 0, :]
    e1 = tri_v[None, :, 1, :] - tri_v[None, :, 0, :]
    e2 = tri_v[None, :, 2, :] - tri_v[None, :, 0, :]
    ob = o[:, None, :]
    db = d[:, None, :]
    pvec = np.cross(db, e2)
    det = (e1 * pvec).sum(-1)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv_det = np.where(np.abs(det) > _DET_EPS, 1.0 / det, 0.0)
    tvec = ob - v0
    u = (tvec * pvec).sum(-1) * inv_det
    qvec = np.cross(tvec, e1)
    v = (db * qvec).sum(-1) * inv_det
    t = (e2 * qvec).sum(-1) * inv_det
    ok = ((np.abs(det) > _DET_EPS) & (u >= 0) & (v >= 0) & (u + v <= 1.0)
          & (t > TNEAR))
    if t_max is not None:
        ok &= t < t_max
    t = np.where(ok, t, np.float32(3.0e38))
    k = np.argmin(t, axis=1) if n else np.zeros(r, np.int64)
    if n == 0:
        return (np.full(r, 3.0e38, np.float32), np.full(r, -1, np.int32),
                np.zeros(r, np.float32), np.zeros(r, np.float32))
    ar = np.arange(r)
    tk = t[ar, k].astype(np.float32)
    hit = tk < 3.0e38
    return (tk,
            np.where(hit, k, -1).astype(np.int32),
            np.where(hit, u[ar, k], 0).astype(np.float32),
            np.where(hit, v[ar, k], 0).astype(np.float32))
