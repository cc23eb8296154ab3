#!/usr/bin/env python
"""Gather/scatter/sort layout microbenchmarks (real TPU).

These A/Bs drove the round-2 data-movement decisions recorded in
PLAN_TPU.md:

  scatter   3x 1-D adds (269 ms) beat one [N,3] row scatter (612 ms);
            set-with-unique-indices is NOT cheaper than add.
  gather    component-major [C, LK] lane-axis gathers (249 ms @16M)
            beat shaped [LK,3,3]+[LK,3,2] takes (449 ms); row-major
            [R, 25+] results are lane-padded to 128 and OOM at 16M.
  compact   argsort of 8M uint32 keys is 55 ms; the payload TAKE
            (~240 ms for 13 f32 lanes) is the floor — col-major take
            is NOT faster there, and W separate 1-D takes are ~7x
            worse.

Methodology per CLAUDE.md: fresh inputs per run, scalar-checksum (or
full np.asarray) sync, run 0 discarded.

Usage: python tools/layout_ab.py [scatter|gather|compact|all]
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

N = 8 << 20
LK = 262144


def bench(name, fn, make_args, runs=3):
    f = jax.jit(fn)
    ts = []
    for run in range(runs + 1):
        args = make_args(jax.random.PRNGKey(run))
        t0 = time.perf_counter()
        out = f(*args)
        np.asarray(out)
        if run:
            ts.append(time.perf_counter() - t0)
    print(f"{name:34s} {np.mean(ts) * 1e3:8.1f} ms", flush=True)


def scatter_suite():
    contrib = jnp.asarray(np.random.rand(N, 3).astype(np.float32))
    npix = 1 << 20

    def mk(key):
        qid = jax.random.permutation(key, jnp.arange(N, dtype=jnp.int32))
        term = jax.random.uniform(key, (N,)) < 0.2
        return (jnp.where(term, qid % npix, npix), contrib)

    def row(pix, c):
        acc = jnp.zeros((npix, 3), jnp.float32)
        return acc.at[pix].add(c, mode="drop").sum()

    def three_1d(pix, c):
        acc = jnp.zeros((npix,), jnp.float32)
        return sum(acc.at[pix].add(c[:, i], mode="drop").sum()
                   for i in range(3))

    bench("scatter: [N,3] row add", row, mk)
    bench("scatter: 3x 1-D adds", three_1d, mk)


def gather_suite():
    r = 16 << 20
    tblT = jnp.asarray(np.random.rand(25, LK).astype(np.float32))
    tbl33 = jnp.asarray(np.random.rand(LK, 3, 3).astype(np.float32))
    tbl32 = jnp.asarray(np.random.rand(LK, 3, 2).astype(np.float32))

    def mk(key):
        return (jax.random.randint(key, (r,), 0, LK),)

    bench("gather: [25,LK] lane-axis @16M",
          lambda i: sum(jnp.take(tblT, i, axis=1)[c].sum()
                        for c in range(25)), mk)
    bench("gather: [LK,3,3]+[LK,3,2] @16M",
          lambda i: (jnp.take(tbl33, i, axis=0).sum()
                     + jnp.take(tbl32, i, axis=0).sum()), mk)


def compact_suite():
    arrs = [jnp.asarray(np.random.rand(N).astype(np.float32))
            for _ in range(13)]

    def mk(key):
        k = jax.random.randint(key, (N,), 0, 1 << 30,
                               dtype=jnp.int32).astype(jnp.uint32)
        return (k, *arrs)

    bench("compact: argsort only",
          lambda k, *a: jnp.argsort(k).sum(), mk)
    bench("compact: argsort + [N,13] take",
          lambda k, *a: jnp.take(jnp.stack(a, axis=1),
                                 jnp.argsort(k), axis=0)[:, 0].sum(),
          mk)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("scatter", "all"):
        scatter_suite()
    if which in ("gather", "all"):
        gather_suite()
    if which in ("compact", "all"):
        compact_suite()
