#!/usr/bin/env python
"""Follow-up to probe_rtt: can CONCURRENT host threads overlap the
per-program RPC cost of the axon tunnel?

probe_rtt measured ~40 ms per program that single-threaded dispatch
cannot hide (pipelined == serial): the execute path behaves like a
synchronous RPC. If two threads each driving independent programs
overlap their RPCs, a two-wave interleave of the wavefront host loop
would hide the per-bounce sync; if not, the only lever is fewer,
bigger programs (bounce fusion).
"""

import threading
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")


def main():
    print(f"# device: {jax.devices()[0]}")

    @jax.jit
    def tiny(x):
        return (x * 3 + 1).sum()

    @jax.jit
    def medium(x):
        y = x
        for _ in range(8):
            y = jnp.sin(y) * 1.0001 + 0.1
        return y.sum()

    xs = [jnp.asarray(np.random.rand(128).astype(np.float32))
          for _ in range(64)]
    bigs = [jnp.asarray(np.random.rand(4 << 20).astype(np.float32))
            for _ in range(64)]
    np.asarray(tiny(xs[0]))
    np.asarray(medium(bigs[0]))

    def run_n(fn, pool, n, ofs):
        for i in range(n):
            np.asarray(fn(pool[(ofs + i) % len(pool)]))

    for name, fn, pool, n in (("tiny", tiny, xs, 32),
                              ("medium", medium, bigs, 16)):
        t0 = time.perf_counter()
        run_n(fn, pool, n, 0)
        one = time.perf_counter() - t0

        # same TOTAL program count split over two threads. FRESH pool
        # offsets — the 1-thread pass consumed [0, n); replaying those
        # exact (fn, input) pairs here could hit the runtime's
        # identical-execution memoization (CLAUDE.md) and overstate
        # the concurrency speedup.
        t0 = time.perf_counter()
        a = threading.Thread(target=run_n, args=(fn, pool, n // 2, n))
        b = threading.Thread(target=run_n,
                             args=(fn, pool, n // 2, n + n // 2))
        a.start(); b.start(); a.join(); b.join()
        two = time.perf_counter() - t0
        print(f"# {name}: {n} programs 1-thread {one * 1e3:.1f} ms, "
              f"2-thread {two * 1e3:.1f} ms -> speedup {one / two:.2f}x")


if __name__ == "__main__":
    main()
