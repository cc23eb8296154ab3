#!/usr/bin/env python
"""Measure the per-bounce bucket-shrink cost in the wavefront host loop.

Between bounce programs the host shrinks the queue to the next bucket:
`tuple(a[:b] for a in state[:13])` — 13 EAGER slice dispatches. On the
axon backend every device-program execute is a synchronous ~35-40 ms
RPC (tools/probe_rtt.py), so if eager slices ride the same path this
is ~0.5 s of host-blocked time per shrink, invisible in SRT_PROFILE's
per-bounce clock only because it is charged to the same bounce.

A/B here:
  eager13 — 13 eager a[:b] slices (the current host loop)
  fused1  — ONE jitted program slicing all 13 (static out size)

Usage: python tools/probe_shrink.py [nsrc_M [ndst_M [reps]]]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

NSRC = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else int(48e6)
NDST = int(float(sys.argv[2]) * 1e6) if len(sys.argv) > 2 else int(32e6)
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 4


def main():
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    if os.environ.get("SRT_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["SRT_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    print("device:", jax.devices()[0].device_kind)

    @functools.partial(jax.jit, static_argnames=("b",))
    def fused(arrs, *, b):
        return tuple(a[:b] for a in arrs)

    for rep in range(REPS):
        # fresh inputs every rep (the runtime memoizes identical
        # executions, CLAUDE.md)
        base = jnp.arange(NSRC, dtype=jnp.float32) + float(rep)
        arrs = tuple(base * (i + 1) for i in range(13))
        jax.block_until_ready(arrs)

        t0 = time.perf_counter()
        out = tuple(a[:NDST] for a in arrs)
        jax.block_until_ready(out)
        # sync truth: force a transfer (block_until_ready on axon can
        # return early on small outputs; these are large, but be safe)
        np.asarray(out[0][-1])
        t_eager = time.perf_counter() - t0

        t0 = time.perf_counter()
        out2 = fused(arrs, b=NDST)
        jax.block_until_ready(out2)
        np.asarray(out2[0][-1])
        t_fused = time.perf_counter() - t0

        tag = " (warm-up, discarded)" if rep == 0 else ""
        print(f"rep {rep}: eager13 {t_eager * 1e3:8.1f} ms   "
              f"fused1 {t_fused * 1e3:8.1f} ms{tag}", flush=True)


if __name__ == "__main__":
    main()
