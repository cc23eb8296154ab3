#!/usr/bin/env python
"""Calibrate the probe clock convention (round-5 VERDICT #8).

Every cycle attribution in PLAN_TPU.md converts wall seconds at a
940 MHz convention (the public v5e clock). This probe cross-checks
the TIMER + the convention against two spec-anchored kernels:

  hbm   one big HBM->HBM f32 copy — achieved GB/s vs the 819 GB/s
        v5e spec (read+write counted)
  mxu   a large bf16 matmul (8192^3) — achieved TFLOP/s vs the
        197 TFLOP/s v5e bf16 peak

If both land at a sane fraction of spec (copies ~70-90%, matmul
~60-90% for a single big dot), wall-clock-derived "cycles at 940 MHz"
is a consistent unit; the NO-GO *ratios* were always clock-free.

Methodology: fresh inputs per run (runtime memoization), np.asarray
fence on a slice, best of 5.
"""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))


def bench(fn, inputs, fence):
    fn(inputs[0])
    ts = []
    for x in inputs:
        t0 = time.perf_counter()
        out = fn(x)
        fence(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    rs = np.random.RandomState(0)
    print(f"# device {jax.devices()[0]}")

    # HBM copy: 1 GB in, 1 GB out
    n = 1 << 28  # 1 GiB of f32
    xs = [jnp.asarray(rs.rand(n // 4).astype(np.float32))
          for _ in range(5)]
    # element-wise add forces a real read+write pass
    f = jax.jit(lambda a: a + jnp.float32(1.0))
    dt = bench(f, xs, lambda o: np.asarray(o[:8]))
    gbs = 2 * xs[0].nbytes / dt / 1e9
    print(f"hbm: {dt*1e3:.2f} ms for 2x{xs[0].nbytes/2**30:.2f} GiB "
          f"-> {gbs:.0f} GB/s ({gbs/819*100:.0f}% of the 819 GB/s "
          f"spec)")

    # MXU bf16 matmul
    m = 8192
    a_s = [jnp.asarray(rs.rand(m, m).astype(np.float32)
                       ).astype(jnp.bfloat16) for _ in range(5)]
    b = jnp.asarray(rs.rand(m, m).astype(np.float32)
                    ).astype(jnp.bfloat16)
    g = jax.jit(lambda a: jax.lax.dot(a, b,
                                      preferred_element_type=jnp.float32))
    dt = bench(g, a_s, lambda o: np.asarray(o[:1, :8]))
    tflops = 2 * m**3 / dt / 1e12
    print(f"mxu: {dt*1e3:.2f} ms for {m}^3 bf16 matmul -> "
          f"{tflops:.0f} TFLOP/s ({tflops/197*100:.0f}% of the "
          f"197 TFLOP/s spec)")
    print("# both within a sane fraction of spec => wall-clock (and "
          "the 940 MHz cycle unit derived from it) is consistent "
          "with the hardware's real clock")


if __name__ == "__main__":
    main()
