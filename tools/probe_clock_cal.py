#!/usr/bin/env python
"""Calibrate the probe clock convention (round-5 VERDICT #8).

Every cycle attribution in PLAN_TPU.md converts wall seconds at a
940 MHz convention (the public v5e clock). This probe cross-checks
the TIMER + the convention against two spec-anchored kernels, using
the SLOPE method (two in-program iteration counts; the ~35-40 ms
per-program RPC that swamped the naive version cancels):

  hbm   K dependent full-array add passes over 1 GiB in one jitted
        fori_loop — slope GB/s vs the 819 GB/s v5e spec
  mxu   K chained 8192^2 bf16 matmuls in one fori_loop — slope
        TFLOP/s vs the 197 TFLOP/s v5e bf16 peak

Methodology: fresh inputs per run, np.asarray fence on a slice,
best of 3 per K.
"""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))


def timed(fn, inputs, fence):
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

    n = 1 << 28  # 1 GiB of f32
    xs = [jnp.asarray(rs.rand(n).astype(np.float32))
          for _ in range(3)]

    def make_add(k):
        @jax.jit
        def f(a):
            return jax.lax.fori_loop(
                0, k, lambda i, y: y + jnp.float32(1.0), a)
        return f

    LO, HI = 4, 16
    t_lo = timed(make_add(LO), xs, lambda o: np.asarray(o[:8]))
    t_hi = timed(make_add(HI), xs, lambda o: np.asarray(o[:8]))
    per = (t_hi - t_lo) / (HI - LO)
    gbs = 2 * xs[0].nbytes / per / 1e9
    print(f"hbm: {per*1e3:.2f} ms per 1 GiB r+w pass -> {gbs:.0f} "
          f"GB/s ({gbs/819*100:.0f}% of the 819 GB/s spec)   "
          f"(raw {t_lo*1e3:.1f}/{t_hi*1e3:.1f} ms at K={LO}/{HI})")

    m = 8192
    a_s = [jnp.asarray(rs.rand(m, m).astype(np.float32)
                       ).astype(jnp.bfloat16) for _ in range(3)]
    b = jnp.asarray(rs.rand(m, m).astype(np.float32)
                    ).astype(jnp.bfloat16)

    def make_mm(k):
        @jax.jit
        def f(a):
            return jax.lax.fori_loop(
                0, k, lambda i, y: jax.lax.dot(
                    y, b, preferred_element_type=jnp.bfloat16), a)
        return f

    t_lo = timed(make_mm(LO), a_s, lambda o: np.asarray(o[:1, :8]))
    t_hi = timed(make_mm(HI), a_s, lambda o: np.asarray(o[:1, :8]))
    per = (t_hi - t_lo) / (HI - LO)
    tflops = 2 * m**3 / per / 1e12
    print(f"mxu: {per*1e3:.2f} ms per 8192^3 bf16 matmul -> "
          f"{tflops:.0f} TFLOP/s ({tflops/197*100:.0f}% of the "
          f"197 TFLOP/s spec)   (raw {t_lo*1e3:.1f}/{t_hi*1e3:.1f} "
          f"ms)")
    print("# the naive (single-op) version of this probe measured 17 "
          "GB/s / 35 TFLOP/s — i.e. the ~30-40 ms per-program RPC "
          "wall, NOT device rates; the slope method is mandatory "
          "for micro-calibration on this backend (CLAUDE.md)")


if __name__ == "__main__":
    main()
