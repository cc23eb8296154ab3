#!/usr/bin/env python
"""Probe kernels for the round-2 traversal redesign (run on real TPU).

Verifies, in a compiled Mosaic kernel:
  a. dynamic-ROW vector load ref[nd] from a [T, 8, 128] VMEM ref
  b. take_along_axis(axis=1) on (8,128) with a runtime-uniform index
     (lane-broadcast gather: idx = 8*g + c for runtime scalar g)
  c. (8,128) x (1,128) broadcast arithmetic
  d. vector -> scalar extraction via VMEM scratch + static-column reads
"""

import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))


def kernel(tiles_ref, nd_ref, rays_ref, out_ref, scratch_ref):
    nd = nd_ref[0]
    tile = tiles_ref[nd // 16]                # (a) dynamic-row vector load
    g = nd % 16

    acc = jnp.zeros((8, 128), jnp.float32)
    for c in range(6):
        idx = jnp.full((8, 128), 8 * g + c, jnp.int32)
        comp = jnp.take_along_axis(tile, idx, axis=1)   # (b)
        acc = acc + comp * rays_ref[:]                  # (c) (8,128)x(1,128)
    scratch_ref[:] = acc
    s = jnp.float32(0)
    for j in range(8):
        s = s + scratch_ref[j, 0]                       # (d) scalar reads
    out_ref[:] = acc + s


def main():
    t = 4
    tiles = np.arange(t * 8 * 128, dtype=np.float32).reshape(t, 8, 128)
    rays = np.linspace(0, 1, 128, dtype=np.float32).reshape(1, 128)
    nd = np.array([2 * 16 + 5], dtype=np.int32)  # tile 2... wait t=4 tiles

    nd = np.array([37], dtype=np.int32)  # tile 2, g=5

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
    )(jnp.asarray(tiles), jnp.asarray(nd), jnp.asarray(rays))
    out = np.asarray(out)

    # reference
    tile = tiles[37 // 16]
    g = 37 % 16
    acc = np.zeros((8, 128), np.float32)
    for c in range(6):
        comp = np.broadcast_to(tile[:, 8 * g + c][:, None], (8, 128))
        acc = acc + comp * rays
    ref = acc + acc[:, 0].sum()

    err = np.abs(out - ref).max()
    print(f"max abs err: {err}")
    assert err < 1e-3, "MISMATCH"
    print("probe OK: dynamic-row load, lane-broadcast gather, "
          "(8,128)x(1,128) broadcast, scratch scalar extraction")


if __name__ == "__main__":
    main()
