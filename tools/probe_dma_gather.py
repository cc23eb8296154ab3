#!/usr/bin/env python
"""Probe a Pallas DMA-pipelined random-row gather vs XLA's take
(round-4 VERDICT #2).

The wavefront's two biggest non-kernel costs are random row gathers:
the compaction packed take (~240 ms for 8M x 13 f32, ~30 ns/row) and
the 16-wide shade-geometry take (~37 Mrows/s, ~27 ns/row). HBM
bandwidth arithmetic says a 16-f32 row is 64 B, so even at 10x sector
waste ~1-5 ms should move the bytes — the VERDICT asks whether XLA's
per-row floor is the hardware's or the gather engine's.

This probe issues per-row DMAs from a Pallas kernel with D copies in
flight (round-robin semaphores), indices prefetched HBM->SMEM in
double-buffered chunks, and the row payload copied HBM->HBM (src row ->
dst row) with no VMEM staging. Modes:

  xla    jnp.take(src, idx, axis=0) baseline (what _compact/shade pay)
  dma    the pipelined row-DMA kernel, D in flight, 8-unrolled loop

Methodology: static loop bounds (no early exit possible), LO/HI row
counts -> slope so fixed costs cancel, correctness asserted against
numpy on the first 4K rows, np.asarray fence on a dependent checksum.
"""

import functools
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))

# Row width. The production rows are 13-16 f32, but Mosaic REJECTS
# DMAs of sub-128-lane row slices of an HBM memref ("Slice shape
# along dimension 1 must be aligned to tiling (128), but is 16") —
# measured fact, first finding of this probe. So the DMA kernel can
# only be measured at 128-lane (512 B) rows; the production-width
# comparison is then arithmetic: a 128-lane queue layout would 8-10x
# the queue's HBM footprint and traffic.
W = int(os.environ.get("PROBE_DMA_W", "128"))
CH = 2048            # index chunk (HBM->SMEM prefetch granularity)
D = int(os.environ.get("PROBE_DMA_D", "16"))   # row DMAs in flight
UNROLL = 8


def make_kernel(rows: int):
    n_chunks = rows // CH

    def kernel(idx_ref, src_ref, out_ref, idx_smem, isem, rsem):
        def idx_dma(buf, c):
            # flat 1-D SMEM staging: a 2-D (2, CH) scratch cannot be
            # dim-0-sliced for DMA (SMEM tiling alignment 2)
            return pltpu.make_async_copy(
                idx_ref.at[pl.ds(c * CH, CH)],
                idx_smem.at[pl.ds(buf * CH, CH)],
                isem.at[buf])

        idx_dma(0, 0).start()

        def chunk_body(c, _):
            buf = c % 2

            @pl.when(c + 1 < n_chunks)
            def _():
                idx_dma((c + 1) % 2, c + 1).start()

            idx_dma(buf, c).wait()

            def row_body(k, _):
                j0 = c * CH + k * UNROLL
                for u in range(UNROLL):
                    j = j0 + u
                    slot = j % D
                    # reuse the slot's semaphore only after its D-ago
                    # copy landed
                    @pl.when(j >= D)
                    def _():
                        pltpu.make_async_copy(
                            src_ref.at[0], out_ref.at[0],
                            rsem.at[slot]).wait()
                    i = idx_smem[buf * CH + k * UNROLL + u]
                    pltpu.make_async_copy(
                        src_ref.at[i], out_ref.at[j],
                        rsem.at[slot]).start()
                return 0

            jax.lax.fori_loop(0, CH // UNROLL, row_body, 0)
            return 0

        jax.lax.fori_loop(0, n_chunks, chunk_body, 0)
        # drain the last D copies
        for slot in range(D):
            pltpu.make_async_copy(src_ref.at[0], out_ref.at[0],
                                  rsem.at[slot]).wait()

    return kernel


def make_flat_kernel(rows: int, w: int):
    """1-D flat-layout variant: src/out as [N*w] f32, each row DMA a
    dynamic-offset length-w slice — probes whether Mosaic accepts
    sub-128-lane DMAs when the memref is 1-D (the 2-D form rejects
    them with a lane-alignment error)."""
    n_chunks = rows // CH

    def kernel(idx_ref, src_ref, out_ref, idx_smem, isem, rsem):
        def idx_dma(buf, c):
            return pltpu.make_async_copy(
                idx_ref.at[pl.ds(c * CH, CH)],
                idx_smem.at[pl.ds(buf * CH, CH)],
                isem.at[buf])

        idx_dma(0, 0).start()

        def chunk_body(c, _):
            buf = c % 2

            @pl.when(c + 1 < n_chunks)
            def _():
                idx_dma((c + 1) % 2, c + 1).start()

            idx_dma(buf, c).wait()

            def row_body(k, _):
                j0 = c * CH + k * UNROLL
                for u in range(UNROLL):
                    j = j0 + u
                    slot = j % D

                    @pl.when(j >= D)
                    def _():
                        pltpu.make_async_copy(
                            src_ref.at[pl.ds(0, w)],
                            out_ref.at[pl.ds(0, w)],
                            rsem.at[slot]).wait()
                    i = idx_smem[buf * CH + k * UNROLL + u]
                    pltpu.make_async_copy(
                        src_ref.at[pl.ds(i * w, w)],
                        out_ref.at[pl.ds(j * w, w)],
                        rsem.at[slot]).start()
                return 0

            jax.lax.fori_loop(0, CH // UNROLL, row_body, 0)
            return 0

        jax.lax.fori_loop(0, n_chunks, chunk_body, 0)
        for slot in range(D):
            pltpu.make_async_copy(src_ref.at[pl.ds(0, w)],
                                  out_ref.at[pl.ds(0, w)],
                                  rsem.at[slot]).wait()

    return kernel


@functools.partial(jax.jit, static_argnames=("rows", "w"))
def dma_gather_flat(idx, src_flat, rows: int, w: int):
    return pl.pallas_call(
        make_flat_kernel(rows, w),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((rows * w,), jnp.float32),
        scratch_shapes=[pltpu.SMEM((2 * CH,), jnp.int32),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((D,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, src_flat)


@functools.partial(jax.jit, static_argnames=("rows",))
def dma_gather(idx, src, rows: int):
    return pl.pallas_call(
        make_kernel(rows),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((rows, W), jnp.float32),
        scratch_shapes=[pltpu.SMEM((2 * CH,), jnp.int32),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((D,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, src)


@jax.jit
def checksum(a):
    return jnp.sum(a[:1024] * 1e-3)


@functools.partial(jax.jit, static_argnames=("rows",))
def xla_gather(idx, src, rows: int):
    return jnp.take(src, idx[:rows], axis=0)


def main():
    n_src = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else \
        int(8e6)
    modes = sys.argv[2].split(",") if len(sys.argv) > 2 else \
        ["xla", "dma", "flat16"]
    rng = np.random.RandomState(11)
    src = jnp.asarray(rng.rand(n_src, W).astype(np.float32))
    LO, HI = (n_src // 4) // CH * CH, n_src // CH * CH

    idxs = [jnp.asarray(rng.randint(0, n_src, HI).astype(np.int32))
            for _ in range(6)]

    if "dma" in modes:
        # correctness (dma path, small prefix)
        out = dma_gather(idxs[0], src, LO)
        got = np.asarray(out[:4096])
        want = np.asarray(src)[np.asarray(idxs[0])[:4096]]
        assert np.array_equal(got, want), "dma gather wrong!"
        print(f"dma gather correct on 4096-row prefix (src {n_src} "
              f"rows, D={D})")

    FW = 16   # flat-variant row width: the production 13-16 f32 class
    src_flat = None
    if "flat16" in modes:
        src_flat = jnp.asarray(
            rng.rand(n_src * FW).astype(np.float32))
        out = dma_gather_flat(idxs[0], src_flat, LO, FW)
        got = np.asarray(out[: 4096 * FW]).reshape(4096, FW)
        want = np.asarray(src_flat).reshape(n_src, FW)[
            np.asarray(idxs[0])[:4096]]
        assert np.array_equal(got, want), "flat dma gather wrong!"
        print(f"flat16 dma gather correct (64 B rows, 1-D layout)")

    runners = {"xla": lambda i, r: xla_gather(i, src, r),
               "dma": lambda i, r: dma_gather(i, src, r),
               "flat16": lambda i, r: dma_gather_flat(i, src_flat,
                                                      r, FW)}
    for name in modes:
        fn = runners[name]
        res = {}
        for rows in (LO, HI):
            fn(idxs[5], rows)   # compile
            ts = []
            for i in range(5):
                t0 = time.perf_counter()
                a = fn(idxs[i], rows)
                _ = np.asarray(checksum(a))
                ts.append(time.perf_counter() - t0)
            res[rows] = min(ts)
        slope = (res[HI] - res[LO]) / (HI - LO)
        print(f"{name}: {slope*1e9:6.1f} ns/row "
              f"({1e-6/slope:6.1f} Mrows/s)  "
              f"(raw {res[LO]*1e3:.1f} / {res[HI]*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
