#!/usr/bin/env python
"""Can the terminated-segment scatter exploit its SORTED pixel order?

The deferred accumulation (wavefront._scatter_terminated) scatter-adds
a pixel-SORTED terminated segment (the 3-way compaction key orders it
by 0x80000000|pix) into the [n,3] accumulator — 252 ms at the captured
8M-bucket bounce (PLAN_TPU round-3 split), done as three 1-D
`.at[pix].add` ops that tell XLA nothing about the order. Variants:

  cur       three 1-D .at[].add(mode="drop")            (production)
  sorted    same + indices_are_sorted=True
  segsum    jax.ops.segment_sum(..., indices_are_sorted=True) x3
  dedup     sorted-duplicate pre-reduction: one cumsum + boundary diff
            per channel, then a scatter of UNIQUE sorted pixels
            (duplicate factor m/n fewer scatter rows + both flags set)

Methodology: fresh index/value arrays per rep (the runtime memoizes
identical executions), np.asarray fence on a dependent checksum,
numpy cross-check of every variant first.
"""

import functools
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))

N_PIX = int(float(os.environ.get("PROBE_SC_NPIX", 1 << 20)))
M = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else int(4e6)


@jax.jit
def cur(acc, pix, vx, vy, vz):
    return jnp.stack(
        [acc[:, i].at[pix].add(v, mode="drop")
         for i, v in enumerate((vx, vy, vz))], axis=1)


@jax.jit
def sorted_flag(acc, pix, vx, vy, vz):
    return jnp.stack(
        [acc[:, i].at[pix].add(v, mode="drop",
                               indices_are_sorted=True)
         for i, v in enumerate((vx, vy, vz))], axis=1)


@jax.jit
def segsum(acc, pix, vx, vy, vz):
    return acc + jnp.stack(
        [jax.ops.segment_sum(v, pix, num_segments=N_PIX,
                             indices_are_sorted=True)
         for v in (vx, vy, vz)], axis=1)


@jax.jit
def dedup(acc, pix, vx, vy, vz):
    # sorted duplicates are adjacent: last row of each pixel group
    # carries the group's cumsum; diff of gathered group-end cumsums =
    # per-pixel totals, scattered once with unique sorted indices
    last = jnp.concatenate([pix[1:] != pix[:-1],
                            jnp.ones((1,), bool)])
    # group-end positions in sorted order, compacted to the front
    gpos = jnp.where(last, jnp.arange(M, dtype=jnp.int32), M)
    gpos = jnp.sort(gpos)                       # unique ends first
    gpix = jnp.where(gpos < M, pix[jnp.minimum(gpos, M - 1)], N_PIX)
    outs = []
    for v in (vx, vy, vz):
        cs = jnp.cumsum(v)
        ends = cs[jnp.minimum(gpos, M - 1)]
        prev = jnp.concatenate([jnp.zeros((1,), jnp.float32),
                                ends[:-1]])
        tot = jnp.where(gpos < M, ends - prev, 0.0)
        outs.append(tot)
    upd = jnp.stack(outs, axis=1)
    return acc.at[gpix].add(upd, mode="drop", indices_are_sorted=True,
                            unique_indices=True)


@jax.jit
def checksum(a):
    return jnp.sum(a[:1024])


def main():
    rng = np.random.RandomState(3)
    variants = {"cur": cur, "sorted": sorted_flag, "segsum": segsum,
                "dedup": dedup}

    # correctness (small)
    pix_s = np.sort(rng.randint(0, 1000, 5000).astype(np.int32))
    vals = [rng.rand(5000).astype(np.float32) for _ in range(3)]
    acc0 = np.zeros((N_PIX, 3), np.float32)
    want = acc0.copy()
    for i, v in enumerate(vals):
        np.add.at(want[:, i], pix_s, v)
    for name, fn in variants.items():
        if name == "dedup":
            continue  # closes over M; checked at full size below
        got = np.asarray(fn(jnp.asarray(acc0), jnp.asarray(pix_s),
                            *[jnp.asarray(v) for v in vals]))
        assert np.allclose(got, want, atol=1e-3), name
    print("correctness ok (cur/sorted/segsum vs numpy)")

    datasets = []
    for i in range(6):
        pix = np.sort(rng.randint(0, N_PIX, M).astype(np.int32))
        vs = [jnp.asarray(rng.rand(M).astype(np.float32))
              for _ in range(3)]
        datasets.append((jnp.asarray(pix), vs))
    acc = jnp.zeros((N_PIX, 3), jnp.float32)

    # dedup correctness at full size (vs cur)
    a1 = np.asarray(cur(acc, datasets[0][0], *datasets[0][1]))
    a2 = np.asarray(dedup(acc, datasets[0][0], *datasets[0][1]))
    err = np.abs(a1 - a2).max()
    print(f"dedup vs cur max abs err {err:.2e} (cumsum reassociation)")

    for name, fn in variants.items():
        fn(acc, datasets[5][0], *datasets[5][1])  # compile
        ts = []
        for i in range(5):
            t0 = time.perf_counter()
            a = fn(acc, datasets[i][0], *datasets[i][1])
            _ = np.asarray(checksum(a))
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        print(f"{name:7s}: {best*1e3:7.1f} ms  "
              f"({best/M*1e9:5.1f} ns/row, {M} rows -> {N_PIX} pix)")


if __name__ == "__main__":
    main()
