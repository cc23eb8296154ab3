"""Multi-chip rendering over a 2-D device mesh.

The reference is strictly single-device (SURVEY.md section 2.2: no
NCCL/MPI, one SYCL queue). This module is the TPU-native scaling story:

- axis "dp" shards the SAMPLE axis: each chip integrates an spp/dp
  slice of the Monte-Carlo estimator with decorrelated RNG streams
  (sample_offset feeds the counter-based keys), and the linear
  accumulators are reduced with psum over ICI. merge_samples
  (render_wavefront.cpp:319-358) becomes literally one collective.
- axis "sp" shards the PIXEL axis: each chip owns a contiguous slice
  of the flat pixel space (its own queue, its own accumulator block);
  the image is reassembled by the output sharding, no gather needed.

The scene pytree (BVH + triangles + textures, ~10-150 MB) is replicated
into every chip's HBM — paths are embarrassingly parallel after that,
so no per-bounce communication exists at all. Collectives ride ICI
once per frame.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from sycl_ray_tracer_tpu.models.camera import Camera
from sycl_ray_tracer_tpu.models.megakernel import accumulate_megakernel
from sycl_ray_tracer_tpu.models.wavefront import accumulate_wavefront
from sycl_ray_tracer_tpu.ops.vec import linear_to_gamma


def make_mesh(dp: Optional[int] = None, sp: int = 1,
              devices=None) -> Mesh:
    """Mesh over available devices; defaults to all of them on "dp"."""
    devices = devices if devices is not None else jax.devices()
    if dp is None:
        dp = len(devices) // sp
    dev = np.asarray(devices[: dp * sp]).reshape(dp, sp)
    return Mesh(dev, axis_names=("dp", "sp"))


def render_sharded(scene, cam: Camera, *, width: int, height: int,
                   spp: int, max_depth: int, seed: int = 0,
                   mesh: Optional[Mesh] = None,
                   renderer: str = "wavefront",
                   rr: bool = False) -> Tuple[jnp.ndarray,
                                              jnp.ndarray]:
    """Sharded render. Returns (image [H, W, 3] gamma-encoded,
    per-bounce ray counts [max_depth] int32, summed over all shards)."""
    if mesh is None:
        mesh = make_mesh()
    dp = mesh.shape["dp"]
    sp = mesh.shape["sp"]
    n = width * height
    if spp % dp:
        raise ValueError(f"spp={spp} must divide by dp={dp}")
    if n % sp:
        raise ValueError(f"pixels={n} must divide by sp={sp}")
    spp_local = spp // dp
    accumulate = (accumulate_wavefront if renderer == "wavefront"
                  else accumulate_megakernel)

    def shard_fn(scene, cam, lane):
        dpi = jax.lax.axis_index("dp")
        px = (lane % jnp.uint32(width)).astype(jnp.int32)
        py = (lane // jnp.uint32(width)).astype(jnp.int32)
        accum, rays = accumulate(
            scene, cam, px, py, lane,
            spp=spp_local, max_depth=max_depth, seed=seed,
            sample_offset=dpi * spp_local, rr=rr)
        accum = jax.lax.psum(accum, "dp")
        rays = jax.lax.psum(rays, ("dp", "sp"))
        return accum, rays

    lane = jnp.arange(n, dtype=jnp.uint32)
    # check_vma=False: the queue/accumulator carries are materialized
    # inside the shard, so their varying-axis types can't be inferred.
    mapped = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P("sp")),
        out_specs=(P("sp"), P()),
        check_vma=False,
    )

    @functools.partial(jax.jit, static_argnums=())
    def run(scene, cam, lane):
        accum, rays = mapped(scene, cam, lane)
        img = linear_to_gamma(accum * (1.0 / spp))
        return img.reshape(height, width, 3), rays

    return run(scene, cam, lane)
