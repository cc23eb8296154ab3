#!/usr/bin/env python
"""TPU microbenchmarks that drive the round-2 traversal redesign.

Measures (on the real chip, fresh inputs per run, strict blocking):
  1. Standalone big-gather throughput: take(table[T, W], idx[N]) for
     the breadth-first traversal's children/leaf row fetches.
  2. Same gather inside a lax.while_loop (the measured-serialization
     case from PLAN_TPU).
  3. cumsum+scatter compaction and argsort at wavefront queue sizes
     (the per-bounce fixed costs).
Run: python tools/micro_bench.py [case ...]
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))


def timed(fn, reps=3):
    # warm-up on a distinct input index (i=0) to dodge both compile
    # time and the runtime's identical-execution memoization
    out = None
    ts = []
    for i in range(reps + 1):
        t0 = time.perf_counter()
        out = fn(i)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        if i > 0:
            ts.append(dt)
    return min(ts), out


def case_gather():
    print("== standalone gather throughput ==")
    for t_rows, width in [(8192, 48), (65536, 48), (65536, 72),
                          (65536, 16), (524288, 48)]:
        table = jnp.asarray(
            np.random.rand(t_rows, width).astype(np.float32))
        for n in [1 << 20, 1 << 22, 1 << 23]:
            idxs = [jnp.asarray(
                np.random.randint(0, t_rows, n).astype(np.int32))
                for _ in range(4)]

            @jax.jit
            def g(idx):
                return jnp.take(table, idx, axis=0).sum(axis=1)

            def run(i):
                return g(idxs[i % 4])

            dt, _ = timed(run)
            gb = n * width * 4 / 1e9
            print(f"  table[{t_rows},{width}] take {n>>20}M rows: "
                  f"{dt*1e3:7.2f} ms  {gb/dt:7.1f} GB/s  "
                  f"{n/dt/1e6:8.1f} Mrows/s")


def case_gather_loop():
    print("== gather inside lax.while_loop (8 iters) ==")
    t_rows, width = 65536, 48
    table = jnp.asarray(np.random.rand(t_rows, width).astype(np.float32))
    for n in [1 << 20, 1 << 22]:
        idxs = [jnp.asarray(np.random.randint(0, t_rows, n).astype(np.int32))
                for _ in range(4)]

        @jax.jit
        def loop(idx):
            def body(c):
                i, idx, acc = c
                rows = jnp.take(table, idx, axis=0)
                s = rows.sum(axis=1)
                idx2 = (idx + s.astype(jnp.int32)) % t_rows
                return i + 1, idx2, acc + s
            _, _, acc = jax.lax.while_loop(
                lambda c: c[0] < 8, body,
                (jnp.int32(0), idx, jnp.zeros((n,), jnp.float32)))
            return acc

        def run(i):
            return loop(idxs[i % 4])

        dt, _ = timed(run)
        gb = 8 * n * width * 4 / 1e9
        print(f"  {n>>20}M rows x8 iters: {dt*1e3:7.2f} ms "
              f"{gb/dt:7.1f} GB/s  per-iter {dt/8*1e3:6.2f} ms")


def case_compact():
    print("== compaction primitives ==")
    for n in [1 << 20, 1 << 23, 1 << 24]:
        alive_sets = [jnp.asarray(np.random.rand(n) < 0.6) for _ in range(4)]
        payload = tuple(jnp.asarray(np.random.rand(n).astype(np.float32))
                        for _ in range(13))

        @jax.jit
        def compact(alive, payload):
            pos = jnp.cumsum(alive.astype(jnp.int32)) - 1
            dst = jnp.where(alive, pos, n)
            outs = [jnp.zeros_like(p).at[dst].set(p, mode="drop")
                    for p in payload]
            return outs

        def run(i):
            return compact(alive_sets[i % 4], payload)

        dt, _ = timed(run)
        print(f"  cumsum+scatter 13x[{n>>20}M] f32: {dt*1e3:7.2f} ms")

        keys = [jnp.asarray(np.random.randint(0, 2**31, n).astype(np.uint32))
                for _ in range(4)]

        @jax.jit
        def sortperm(k, payload):
            perm = jnp.argsort(k)
            return [jnp.take(p, perm, axis=0) for p in payload]

        def run2(i):
            return sortperm(keys[i % 4], payload)

        dt, _ = timed(run2)
        print(f"  argsort+13-gather [{n>>20}M]:    {dt*1e3:7.2f} ms")

        @jax.jit
        def sortonly(k):
            return jnp.sort(k)

        def run3(i):
            return sortonly(keys[i % 4])

        dt, _ = timed(run3)
        print(f"  sort-only [{n>>20}M] u32:        {dt*1e3:7.2f} ms")


def case_segmin():
    print("== scatter-min (leaf MT results -> per-ray t_best) ==")
    r = 1 << 20
    for n in [1 << 22, 1 << 23]:
        ids = [jnp.asarray(np.random.randint(0, r, n).astype(np.int32))
               for _ in range(4)]
        ts = [jnp.asarray(np.random.rand(n).astype(np.float32))
              for _ in range(4)]

        @jax.jit
        def smin(i, t):
            return jnp.full((r,), 3e38, jnp.float32).at[i].min(t)

        def run(i):
            return smin(ids[i % 4], ts[i % 4])

        dt, _ = timed(run)
        print(f"  scatter-min {n>>20}M -> {r>>20}M: {dt*1e3:7.2f} ms")


CASES = dict(gather=case_gather, gather_loop=case_gather_loop,
             compact=case_compact, segmin=case_segmin)

if __name__ == "__main__":
    names = sys.argv[1:] or list(CASES)
    print(f"# device: {jax.devices()[0]}")
    for nm in names:
        CASES[nm]()
