#!/usr/bin/env python
"""Probe: does bf16 ARITHMETIC for the slab test pay on the VPU?

Round 2 proved bf16 *storage* (directed-rounding packed tiles, results
identical, half VMEM). This probes bf16 *compute*: the slab chain is
~130 cycles of f32 vector ops on (8, 128) registers per visit; bf16
packs two elements per lane, so the SAME math on (16, 128) bf16 covers
TWO visits' children if the layout cooperates — potentially halving
the per-visit vector chain (round-3 VERDICT #8).

Modes (traversal-shaped loop, same methodology as probe_visit_cost —
np.asarray sync, trip-count asserted, two-iteration-count slope):
  f32x2    two sequential (8,128) f32 slab chains per iteration
           (= 2 visits, the baseline vector economics)
  bf16x2   one (16,128) bf16 slab chain per iteration covering the
           same 2 visits' operand volume
  f32x1    one (8,128) f32 chain (= 1 visit), to separate fixed
           per-iteration cost from per-chain cost

Go/no-go: bf16x2 slope ~= f32x1 slope => bf16 halves the chain (GO);
bf16x2 ~= f32x2 => relayout/convert overhead eats it (NO-GO).

RESULT (round 3, v5e via axon): NO-GO at the toolchain level — the
bf16x2 mode never runs. Mosaic has no bf16 dynamic_gather (compile
error on vector<16x128xbf16> gather); routing around it with an f32
gather + pltpu.bitcast widen hits unsupported bf16 compares (cmpf on
the packed vector<8x128x2xbf16> layout fails to lower), and even a
plain-load (16,128) bf16 min/where kernel crashes the compile helper.
bf16 remains storage-only (cfmt="bf16p", unpack-to-f32 in-loop).
"""

import functools
import os
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))

NT = 512


def bg(tile, lane, n=8):
    idx = jnp.full((n, 128), lane, jnp.int32)
    return jnp.take_along_axis(tile, idx, axis=1)


def bg16(tile, lane):
    # Mosaic's dynamic_gather has no bf16 form (measured: compile
    # error); gather the f32 view (2 packed bf16 per lane) and
    # pltpu.bitcast-widen (8,128)f32 -> (16,128)bf16 (verified
    # supported on this toolchain).
    idx = jnp.full((8, 128), lane, jnp.int32)
    g = jnp.take_along_axis(tile, idx, axis=1)
    return pltpu.bitcast(g, jnp.bfloat16)


def _slab(lox, loy, loz, hix, hiy, hiz, ox, ix):
    t1x = (lox - ox) * ix
    t2x = (hix - ox) * ix
    t1y = (loy - ox) * ix
    t2y = (hiy - ox) * ix
    t1z = (loz - ox) * ix
    t2z = (hiz - ox) * ix
    tmin = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                   jnp.minimum(t1y, t2y)),
                       jnp.minimum(t1z, t2z))
    tmax = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                   jnp.maximum(t1y, t2y)),
                       jnp.maximum(t1z, t2z))
    return tmin, tmax


def make_kernel(iters, mode):
    def kernel(tiles_ref, tiles16_ref, rnd_ref, out_ref, it_ref,
               stack_ref, keybuf_ref):
        stack_ref[0] = 0
        ox8 = jnp.full((8, 128), 0.25, jnp.float32)
        ix8 = jnp.full((8, 128), 1.5, jnp.float32)
        ox16 = jnp.full((16, 128), 0.25, jnp.bfloat16)
        ix16 = jnp.full((16, 128), 1.5, jnp.bfloat16)

        def cond(c):
            return c[1] > 0

        def body(c):
            it, sp, acc = c
            node = stack_ref[sp - 1]
            sp = sp - 1
            nd = jnp.minimum(node, NT - 1)
            if mode == "bf16x2":
                tile = tiles_ref[nd]   # f32 view; bg16 bitcast-widens
                base = 8 * (nd % 16)
                lox = bg16(tile, base + 0)
                loy = bg16(tile, base + 1)
                loz = bg16(tile, base + 2)
                hix = bg16(tile, base + 3)
                hiy = bg16(tile, base + 4)
                hiz = bg16(tile, base + 5)
                tmin, tmax = _slab(lox, loy, loz, hix, hiy, hiz,
                                   ox16, ix16)
                x = jnp.where(tmax >= tmin, tmin,
                              jnp.bfloat16(1e9)).astype(jnp.float32)
                x = x[:8] + x[8:]
            else:
                reps = 2 if mode == "f32x2" else 1
                tile = tiles_ref[nd]
                base = 8 * (nd % 16)
                x = jnp.zeros((8, 128), jnp.float32)
                for rep in range(reps):
                    lox = bg(tile, base + 0 + rep)
                    loy = bg(tile, base + 1 + rep)
                    loz = bg(tile, base + 2 + rep)
                    hix = bg(tile, base + 3 + rep)
                    hiy = bg(tile, base + 4 + rep)
                    hiz = bg(tile, base + 5 + rep)
                    tmin, tmax = _slab(lox, loy, loz, hix, hiy, hiz,
                                       ox8, ix8)
                    x = x + jnp.where(tmax >= tmin, tmin,
                                      jnp.float32(1e9))
            acc = acc + x
            key = jnp.min(x, axis=1, keepdims=True)
            keybuf_ref[:] = jnp.broadcast_to(key, (8, 128))
            ks = [keybuf_ref[j, 0] for j in range(8)]
            tot = jnp.int32(0)
            for j in range(8):
                frac = ks[j] - jnp.floor(ks[j])
                tot = tot + jnp.where(frac > 0.5, 1, 0)
            npush = 1 + (tot & 1)
            sp2 = sp
            for j in range(2):
                @pl.when(j < npush)
                def _(j=j, slot=sp2 + j):
                    stack_ref[slot] = (node * 3 + j + 1) % NT
            sp = jnp.minimum(sp + npush, 8000)
            it = it + 1
            sp = jnp.where(it >= iters, 0, jnp.maximum(sp, 1))
            return it, sp, acc

        it, sp, acc = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), jnp.int32(1),
             jnp.zeros((8, 128), jnp.float32)))
        out_ref[...] = acc
        it_ref[0] = it

    return kernel


@functools.partial(jax.jit, static_argnames=("iters", "mode"))
def run(tiles, tiles16, rnd, iters, mode):
    return pl.pallas_call(
        make_kernel(iters, mode),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((8, 128), jnp.float32),
                   jax.ShapeDtypeStruct((1,), jnp.int32)],
        scratch_shapes=[pltpu.SMEM((8192,), jnp.int32),
                        pltpu.VMEM((8, 128), jnp.float32)],
    )(tiles, tiles16, rnd)


def main():
    tile_sets = [jnp.asarray(
        np.random.RandomState(s).rand(NT, 8, 128).astype(np.float32))
        for s in range(8)]
    tile16_sets = [jnp.asarray(
        np.random.RandomState(s).rand(NT, 16, 128)).astype(jnp.bfloat16)
        for s in range(8)]
    rnd = jnp.asarray(
        np.random.RandomState(99).randint(0, 1000, 4096).astype(np.int32))
    LO, HI = 16384, 131072
    for mode in ("f32x1", "f32x2", "bf16x2"):
        res = {}
        for iters in (LO, HI):
            a, itv = run(tile_sets[7], tile16_sets[7], rnd, iters, mode)
            assert int(np.asarray(itv)[0]) == iters, "early exit!"
            ts = []
            for i in range(5):
                t0 = time.perf_counter()
                a, _ = run(tile_sets[i], tile16_sets[i], rnd, iters,
                           mode)
                _ = np.asarray(a)
                ts.append(time.perf_counter() - t0)
            res[iters] = min(ts)
        slope = (res[HI] - res[LO]) / (HI - LO)
        print(f"{mode:8s}: {slope*1e9:7.1f} ns/iter  "
              f"~{slope*940e6:6.0f} cyc/iter   "
              f"(raw {res[LO]*1e3:.1f} / {res[HI]*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
