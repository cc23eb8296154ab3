#!/usr/bin/env python
"""Measure the host<->device round-trip cost of the per-bounce sync.

The wavefront host loop (models/wavefront.py render_wavefront) blocks
on ONE scalar per bounce: `int(state[13])` — the live-queue count that
sizes the next bounce's bucket (the TPU analog of the reference's
shared-USM readback, render_wavefront.cpp:144). On the axon remote
tunnel that readback pays a network RTT while the device sits idle.
This probe measures:

  1. bare RTT: trivial program dispatch + scalar readback, fresh
     inputs every call (the runtime memoizes identical executions).
  2. overlap test: dispatch K independent medium programs back-to-back
     then block on all, vs blocking after each — how much wall time
     queueing ahead actually hides.

Numbers decide whether interleaving two waves in render_wavefront
(fill the sync gap of wave A with queued programs of wave B) is worth
the extra queue memory.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")


def main():
    dev = jax.devices()[0]
    print(f"# device: {dev}")

    @jax.jit
    def tiny(x):
        return (x * 3 + 1).sum()

    # medium program ~ a few ms of real work: big elementwise chain
    @jax.jit
    def medium(x):
        y = x
        for _ in range(8):
            y = jnp.sin(y) * 1.0001 + 0.1
        return y.sum()

    xs = [jnp.asarray(np.random.rand(128).astype(np.float32))
          for _ in range(64)]
    bigs = [jnp.asarray(np.random.rand(4 << 20).astype(np.float32))
            for _ in range(32)]

    # warm-up compiles
    np.asarray(tiny(xs[0]))
    np.asarray(medium(bigs[0]))

    # 1. bare RTT: dispatch + scalar readback per call
    ts = []
    for i in range(32):
        t0 = time.perf_counter()
        np.asarray(tiny(xs[i % len(xs)]))
        ts.append(time.perf_counter() - t0)
    ts = np.array(ts) * 1e3
    print(f"# bare dispatch+readback RTT: median {np.median(ts):.2f} ms, "
          f"p10 {np.percentile(ts, 10):.2f}, p90 {np.percentile(ts, 90):.2f}")

    # 2a. serial: block after each medium program (the current host
    # loop's structure)
    t0 = time.perf_counter()
    for i in range(16):
        np.asarray(medium(bigs[i % len(bigs)]))
    serial = time.perf_counter() - t0

    # 2b. pipelined: dispatch all 16, then block once (what a
    # two-wave interleave approximates: the device never waits for
    # the host between programs)
    t0 = time.perf_counter()
    outs = [medium(bigs[(16 + i) % len(bigs)]) for i in range(16)]
    for o in outs:
        np.asarray(o)
    piped = time.perf_counter() - t0

    print(f"# 16 medium programs: serial {serial * 1e3:.1f} ms, "
          f"pipelined {piped * 1e3:.1f} ms, "
          f"saved {(serial - piped) / 16 * 1e3:.2f} ms/program")
    print(f"# implied per-bounce sync gap ~= "
          f"{max(serial - piped, 0) / 16 * 1e3:.2f} ms; a d10 spp64 "
          f"1024^2 render has ~40 bounce syncs")


if __name__ == "__main__":
    main()
