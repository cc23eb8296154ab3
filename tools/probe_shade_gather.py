#!/usr/bin/env python
"""Probe: shade-table gather layout — transposed lane-axis take
([25, LK], the round-2 choice) vs row-major take ([LK, C] rows,
results lane-PADDED to 128 by XLA — the round-2 OOM hazard at 16M).

The bounce breakdown (round 3, 4M wave, 1.9M live) shows shade/gather
at 182 ms ~= 23% of the whole bounce; the compact PACKED take moves
8M rows in ~240 ms (33M rows/s), which suggests ROW gathers are ~3x
cheaper per ray than the current 25-element lane gather IF the
padded-result allocation fits. This probe measures both layouts at
production bucket sizes so the shade path can switch on data.

Methodology: fresh random indices per timed run (runtime memoizes
identical executions), np.asarray fence, min of 4.
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

LK = 250_000      # sponza_proc-scale triangle count
C = 25            # shade_tbl components


def main():
    rs = np.random.RandomState(0)
    tbl_lane = jnp.asarray(rs.rand(C, LK).astype(np.float32))
    tbl_row = jnp.asarray(
        np.ascontiguousarray(np.asarray(tbl_lane).T))

    @jax.jit
    def g_lane(idx):
        g = jnp.take(tbl_lane, idx, axis=1)          # [25, R]
        return sum(g[i] for i in range(C))

    @jax.jit
    def g_row(idx):
        g = jnp.take(tbl_row, idx, axis=0)           # [R, 25]
        return g.sum(axis=1)

    @jax.jit
    def g_row_half(idx):
        # two half-takes: halves the padded transient for big buckets
        h = idx.shape[0] // 2
        a = jnp.take(tbl_row, idx[:h], axis=0).sum(axis=1)
        b = jnp.take(tbl_row, idx[h:], axis=0).sum(axis=1)
        return jnp.concatenate([a, b])

    for R in (1 << 21, 1 << 22, 1 << 23):
        idxs = [jnp.asarray(
            np.random.RandomState(7 + i).randint(0, LK, R)
            .astype(np.int32)) for i in range(5)]
        jax.block_until_ready(idxs)
        for name, fn in (("lane[25,LK]", g_lane),
                         ("row [LK,25]", g_row),
                         ("row 2xhalf ", g_row_half)):
            try:
                out = fn(idxs[0])
                _ = np.asarray(out[:8])
                ts = []
                for i in (1, 2, 3, 4):
                    t0 = time.perf_counter()
                    out = fn(idxs[i])
                    _ = np.asarray(out[:8])
                    ts.append(time.perf_counter() - t0)
                dt = min(ts)
                print(f"R={R >> 20:2d}M {name}: {dt * 1e3:8.1f} ms  "
                      f"{R / dt / 1e6:7.1f} Mrows/s", flush=True)
            except Exception as e:
                print(f"R={R >> 20:2d}M {name}: FAIL "
                      f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
