#!/usr/bin/env python
"""Attribute the per-visit cost of a traversal-style Mosaic loop.

Methodology notes (hard-won, round 2):
- `jax.block_until_ready` on a small pallas output does NOT reliably
  wait for device completion on the axon backend — time with a forced
  `np.asarray` transfer.
- A data-dependent while_loop can silently exit early (stack-pointer
  overflow past the SMEM scratch) — always emit the final iteration
  count and check it.
- Subtract the ~42-46 ms fixed call cost by measuring two iteration
  counts and taking the slope.

Each mode removes ONE mechanism from the full chain; the slope
difference attributes its cost. Modes:
  full      tile load + 6 gathers + 8 vec ops + reduce + keybuf store
            + 8 scalar readbacks + data-dependent pushes
  noread    pushes driven by SMEM-resident randomness (no vector ->
            scalar readback); vector work unchanged
  nogather  2 gathers instead of 6
  noreduce  key from x directly (no 128-lane min)
  novec     no tile load / vector work at all (scalar loop floor)
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

NT = 512


def bg(tile, lane, n=8):
    idx = jnp.full((n, 128), lane, jnp.int32)
    return jnp.take_along_axis(tile, idx, axis=1)


def make_kernel(iters, mode):
    def kernel(tiles_ref, rnd_ref, out_ref, it_ref, stack_ref,
               keybuf_ref):
        stack_ref[0] = 0

        def cond(c):
            return c[1] > 0

        def body(c):
            it, sp, acc = c
            node = stack_ref[sp - 1]
            sp = sp - 1
            nd = jnp.minimum(node, NT - 1)
            if mode == "novec":
                x = acc
            else:
                tile = tiles_ref[nd]
                base = 8 * (nd % 16)
                if mode == "nogather":
                    lox = bg(tile, base + 0)
                    loy = bg(tile, base + 1)
                    loz = hix = hiy = hiz = lox
                else:
                    lox = bg(tile, base + 0)
                    loy = bg(tile, base + 1)
                    loz = bg(tile, base + 2)
                    hix = bg(tile, base + 3)
                    hiy = bg(tile, base + 4)
                    hiz = bg(tile, base + 5)
                x = (lox - loy) * (loz + 1.0)
                x = jnp.maximum(x, (hix - hiy) * (hiz + 0.5))
                for _ in range(3):
                    x = jnp.maximum(x * 1.0001 + 0.5, x)
                    x = jnp.minimum(x * 0.9999 - 0.25, x + 1.0)
                acc = acc + x
            if mode in ("full", "nogather"):
                key = jnp.min(x, axis=1, keepdims=True)
                keybuf_ref[:] = jnp.broadcast_to(key, (8, 128))
            elif mode == "noreduce":
                keybuf_ref[:] = x
            if mode == "noread" or mode == "novec":
                npush = 1 + (rnd_ref[it % 4096] & 1)
            else:
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
def run(tiles, rnd, iters, mode):
    return pl.pallas_call(
        make_kernel(iters, mode),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((8, 128), jnp.float32),
                   jax.ShapeDtypeStruct((1,), jnp.int32)],
        scratch_shapes=[pltpu.SMEM((8192,), jnp.int32),
                        pltpu.VMEM((8, 128), jnp.float32)],
    )(tiles, rnd)


def main():
    tile_sets = [jnp.asarray(
        np.random.RandomState(s).rand(NT, 8, 128).astype(np.float32))
        for s in range(8)]
    rnd = jnp.asarray(
        np.random.RandomState(99).randint(0, 1000, 4096).astype(np.int32))
    LO, HI = 16384, 131072
    for mode in ("full", "noread", "nogather", "noreduce", "novec"):
        res = {}
        for iters in (LO, HI):
            a, itv = run(tile_sets[7], rnd, iters, mode)
            assert int(np.asarray(itv)[0]) == iters, "early exit!"
            ts = []
            for i in range(5):
                t0 = time.perf_counter()
                a, _ = run(tile_sets[i], rnd, iters, mode)
                _ = np.asarray(a)
                ts.append(time.perf_counter() - t0)
            res[iters] = min(ts)
        slope = (res[HI] - res[LO]) / (HI - LO)
        print(f"{mode:9s}: {slope*1e9:7.1f} ns/iter  "
              f"~{slope*940e6:6.0f} cyc/iter   "
              f"(raw {res[LO]*1e3:.1f} / {res[HI]*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
