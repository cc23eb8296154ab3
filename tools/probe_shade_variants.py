#!/usr/bin/env python
"""Probe: shade_lanes layout variants under the REAL access pattern.

probe_shade_gather.py timed `take(...).sum(axis=1)` — XLA fuses that
reduction into the gather and never materializes the lane-padded
[R, 128] transient, so its 2.2x row-take "win" does not transfer to
shade_lanes, which must extract 25 separate component vectors (round-3
breakdown: shade/gather 325 ms at an 8M bucket vs the ~120 the probe
predicted). This probe times each candidate producing the SAME outputs
shade_lanes needs (three disjoint [R] combinations, so no cross-comp
reduction fusion can cheat), with fresh indices per run and an
np.asarray fence:

  lane25   [25, LK] take axis=1, rows out        (round-2 layout)
  row25    [LK, 25] take axis=0, column extracts (round-3 layout)
  lane16   [16, LK] geometry+matid take, plus the 10 material
           constants via tiny [M]-table takes keyed by the gathered
           mat id (materials are ~10s of entries; those takes are
           cache-resident)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))

LK = 250_000
C = 25
M = 32          # material count (sponza_proc has ~16)


def outputs(c, u, v):
    """Mimic shade_lanes' consumption: interpolated normal comp,
    interpolated u, and a material combo — three [R] results built
    from disjoint component sets (no shared reduction to fuse)."""
    w = 1.0 - u - v
    nx = w * c[0] + u * c[3] + v * c[6]
    ny = w * c[1] + u * c[4] + v * c[7]
    nz = w * c[2] + u * c[5] + v * c[8]
    uu = w * c[9] + u * c[11] + v * c[13]
    vv = w * c[10] + u * c[12] + v * c[14]
    mat = c[15] + c[16] * 2.0 + c[19] + c[20] + c[22]
    a, b, m = nx + ny + nz, uu + vv, mat
    # outputs + one scalar checksum: timing syncs the checksum (a full
    # [R] device->host pull over the axon tunnel costs ~1 s and swamps
    # the measurement — see the first, discarded version of this probe)
    return (a, b, m), a.sum() + b.sum() + m.sum()


def main():
    rs = np.random.RandomState(0)
    tbl = rs.rand(C, LK).astype(np.float32)
    tbl_lane = jnp.asarray(tbl)
    tbl_row = jnp.asarray(np.ascontiguousarray(tbl.T))
    # lane16: comps 0-14 are geometry, comp 15 the material id
    geo = np.concatenate([tbl[:15], rs.randint(0, M, (1, LK))
                          .astype(np.float32)], axis=0)
    geo_lane = jnp.asarray(geo)
    mat_tbl = [jnp.asarray(rs.rand(M).astype(np.float32))
               for _ in range(10)]

    @jax.jit
    def lane25(idx):
        g = jnp.take(tbl_lane, idx, axis=1)
        return outputs([g[i] for i in range(C)], g[9], g[10])

    @jax.jit
    def row25(idx):
        CH = 1 << 21
        R = idx.shape[0]
        if R <= CH:
            g = jnp.take(tbl_row, idx, axis=0)
            c = [g[:, i] for i in range(C)]
        else:
            parts = [jnp.take(tbl_row, idx[i:i + CH], axis=0)
                     for i in range(0, R, CH)]
            c = [jnp.concatenate([p[:, i] for p in parts])
                 for i in range(C)]
        return outputs(c, c[9], c[10])

    @jax.jit
    def lane16(idx):
        g = jnp.take(geo_lane, idx, axis=1)
        mid = g[15].astype(jnp.int32)
        mats = [jnp.take(t, mid) for t in mat_tbl]
        c = [g[i] for i in range(15)] + mats
        return outputs(c, g[9], g[10])

    for R in (1 << 22, 1 << 23):
        idxs = [jnp.asarray(rs.randint(0, LK, R).astype(np.int32))
                for _ in range(5)]
        for name, fn in (("lane25", lane25), ("row25", row25),
                         ("lane16", lane16)):
            _, ck = fn(idxs[0])
            np.asarray(ck)
            ts = []
            for i in range(1, 5):
                t0 = time.perf_counter()
                _, ck = fn(idxs[i])
                np.asarray(ck)
                ts.append(time.perf_counter() - t0)
            best = min(ts)
            print(f"R={R >> 20}M {name}: {best * 1e3:7.1f} ms "
                  f"({R / best / 1e6:5.1f} Mrows/s)", flush=True)


if __name__ == "__main__":
    main()
