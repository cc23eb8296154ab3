"""Woop world->unit-triangle transform tiles for the batched-MXU
leaf drain (ops/traverse_pallas8.py).

Per triangle (v0, e1, e2) the affine map M = inv([e1 e2 n]) (rows =
u, v, z functionals; n = e1 x e2) sends a world point p to
(u', v', z') with the triangle at the unit simplex in the z'=0 plane:
    t = -o'z / d'z,  u = o'u + t d'u,  v = o'v + t d'v
so one dot_general per batch of drained leaves computes every
(tri, ray) transformed origin/direction on the MXU, replacing the
per-leaf VPU Moller-Trumbore block (measured: batch-8 drain ~134
cyc/leaf-visit vs ~210-235 for the VPU block, tools/probe_mxu_batch).

M is inverted in float64 and stored f32 (numpy crosscheck vs MT
t/u/v: worst rel err ~5e-4 on random triangles, tools/probe_mxu_mt).
Degenerate or padding triangles get a dead block (o'z = -BIG, d' = 0
-> t = +inf, u/v = NaN, every hit test false).

Role match: the triangle test of /root/reference/src/trace_ray.hpp:22
(the reference's Embree rtcIntersect1 leaf stage), reshaped for a
systolic matmul unit.

Tile layouts (both one (8, 128) f32 tile per group, like
wbvh.pack_tiles_np):

  affine48 — 2 leaves/tile at lanes [0:48] and [64:112] (256 B/tri).
    Leaf block [8 rows, 48 cols]: cols 8c+s (c in o'x,o'y,o'z,
    d'x,d'y,d'z; s = tri slot): o' cols carry M rows in rows 0-2 and
    the translation in row 3 (the ray matrix's row 3 is 1); d' cols
    carry M rows in rows 4-6. Contracts with rays
    [8, R] = (ox,oy,oz,1,dx,dy,dz,0).

  compact32 — 4 leaves/tile at aligned 32-lane quarters (128 B/tri).
    Leaf block [8 rows, 32 cols]: cols 0:8 = u functionals, 8:16 = v,
    16:24 = z, 24:32 pad; rows 0-2 = M rows, row 3 = translation.
    Contracts with the o|d doubled ray matrix (o-half row 3 = 1,
    d-half = 0).
"""

from __future__ import annotations

import numpy as np

_BIG = np.float32(1e30)


def woop_from_leaf_rows(leaf_rows: np.ndarray, k: int = 8):
    """leaf_rows [L, 9*k] (v0/e1/e2 xyz component-major, the
    sah.leaf_rows layout) -> (M [L, k, 3, 3] f32, tr [L, k, 3] f32,
    dead [L, k] bool)."""
    L = leaf_rows.shape[0]
    r = leaf_rows.reshape(L, 9, k).astype(np.float64)
    v0 = r[:, 0:3].transpose(0, 2, 1)       # [L, k, 3]
    e1 = r[:, 3:6].transpose(0, 2, 1)
    e2 = r[:, 6:9].transpose(0, 2, 1)
    n = np.cross(e1, e2)
    A = np.stack([e1, e2, n], axis=3)       # [L, k, 3, 3] columns
    det = np.linalg.det(A)
    # padding rows are all-zero (det 0); tiny-det tris are dead too —
    # the MT path rejects them via its det test (_DET_EPS on the
    # ray-dependent det; the build-time |n|^2 det only catches the
    # degenerate-geometry subset, rays parallel to the plane die via
    # d'z = 0 -> t = inf at intersection time)
    dead = np.abs(det) < 1e-30
    A[dead] = np.eye(3)
    M = np.linalg.inv(A)                     # rows: u, v, z functionals
    tr = -np.einsum("lkij,lkj->lki", M, v0)
    M = M.astype(np.float32)
    tr = tr.astype(np.float32)
    M[dead] = 0.0
    tr[dead] = 0.0
    tr[dead, 2] = -_BIG                      # o'z huge -> t = +inf
    return M, tr, dead


def pack_wtiles_affine_np(leaf_rows: np.ndarray,
                          k: int = 8) -> np.ndarray:
    """-> [ceil(L/2), 8, 128] f32 (2 leaves/tile, lanes 0:48/64:112)."""
    if k != 8:
        raise ValueError("woop tiles require leaf_size=8")
    M, tr, _ = woop_from_leaf_rows(leaf_rows, k)
    L = M.shape[0]
    blk = np.zeros((L, 8, 48), np.float32)
    for c in range(3):
        # o'c cols at lanes 8c+s: rows 0-2 = M[c,:], row 3 = tr[c]
        blk[:, 0:3, 8 * c: 8 * c + 8] = M[:, :, c, :].transpose(0, 2, 1)
        blk[:, 3, 8 * c: 8 * c + 8] = tr[:, :, c]
        # d'c cols at lanes 24+8c+s: rows 4-6 = M[c,:]
        blk[:, 4:7, 24 + 8 * c: 24 + 8 * c + 8] = \
            M[:, :, c, :].transpose(0, 2, 1)
    nt = -(-L // 2)
    tiles = np.zeros((nt, 8, 128), np.float32)
    # dead-pad leaves (beyond L) must also never hit: all-zero cols
    # give o'z = 0, d'z = 0 -> t = -0/0 = NaN -> ok false. Safe.
    tiles[: (L + 1) // 2, :, 0:48] = blk[0::2]
    tiles[: L // 2, :, 64:112] = blk[1::2]
    return tiles


def pack_wtiles_compact32_np(leaf_rows: np.ndarray,
                             k: int = 8) -> np.ndarray:
    """-> [ceil(L/4), 8, 128] f32 (4 leaves/tile, 32-lane quarters)."""
    if k != 8:
        raise ValueError("woop tiles require leaf_size=8")
    M, tr, _ = woop_from_leaf_rows(leaf_rows, k)
    L = M.shape[0]
    blk = np.zeros((L, 8, 32), np.float32)
    for c in range(3):
        blk[:, 0:3, 8 * c: 8 * c + 8] = M[:, :, c, :].transpose(0, 2, 1)
        blk[:, 3, 8 * c: 8 * c + 8] = tr[:, :, c]
    nt = -(-L // 4)
    tiles = np.zeros((nt, 8, 128), np.float32)
    for q in range(4):
        nq = len(range(q, L, 4))
        tiles[:nq, :, 32 * q: 32 * q + 32] = blk[q::4]
    return tiles


def np_woop_hit(leaf_rows: np.ndarray, o: np.ndarray, d: np.ndarray,
                k: int = 8, tnear: float = 1e-4):
    """Reference evaluation for tests: closest (t, slot, u, v) over
    every triangle in leaf_rows for rays o, d [R, 3] — the exact
    algebra the batched kernel epilogue computes."""
    M, tr, dead = woop_from_leaf_rows(leaf_rows, k)
    L = M.shape[0]
    R = o.shape[0]
    Mf = M.reshape(L * k, 3, 3)
    trf = tr.reshape(L * k, 3)
    op = np.einsum("tij,rj->tri", Mf, o) + trf[:, None, :]
    dp = np.einsum("tij,rj->tri", Mf, d)
    with np.errstate(divide="ignore", invalid="ignore"):
        t = -op[:, :, 2] / dp[:, :, 2]
        u = op[:, :, 0] + t * dp[:, :, 0]
        v = op[:, :, 1] + t * dp[:, :, 1]
    ok = ((u >= 0) & (v >= 0) & (u + v <= 1) & (t > tnear)
          & ~dead.reshape(L * k)[:, None])
    t = np.where(ok, t, np.inf)
    j = t.argmin(axis=0)
    rr = np.arange(R)
    return (t[j, rr].astype(np.float32), j,
            u[j, rr].astype(np.float32), v[j, rr].astype(np.float32))
