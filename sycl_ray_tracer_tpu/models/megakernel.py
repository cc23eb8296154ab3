"""Megakernel renderer: one fused jitted program for the whole frame.

Parity target: render_megakernel.cpp:20-63, 75-187. The reference runs
an 8x8-workgroup SYCL kernel with per-thread sample and bounce loops;
the TPU-native shape is one traced program over all pixels at once —
XLA fuses camera gen, traversal step, and shading into large vector
ops, and the sample loop is a lax.fori_loop carrying the accumulator.

Paths that exhaust max_depth contribute black, exactly like the
reference (render_pixel returns float3(0) at loop end).

Ray counting matches the reference (render_megakernel.cpp:31-33): the
counter increments at the top of every bounce iteration a path is still
alive for; totals are per-bounce int32 tallies summed on the host.

`accumulate_megakernel` is the unjitted linear-space core shared with
the multi-chip path (parallel/mesh.py): it takes explicit pixel/lane
arrays so a device mesh can shard pixels and samples independently and
psum the linear accumulator before gamma encoding.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from sycl_ray_tracer_tpu.models import trace as _trace
from sycl_ray_tracer_tpu.models.camera import Camera, generate_rays
from sycl_ray_tracer_tpu.models.trace import PathState
from sycl_ray_tracer_tpu.ops import rng as _rng
from sycl_ray_tracer_tpu.ops.vec import V3, linear_to_gamma, splat


def _sample_one(scene, cam: Camera, px, py, lane, sample_idx, seed,
                max_depth: int, rays, active=None, rr: bool = False,
                sort_every: int = 0):
    """Render one sample for every listed pixel; returns (color V3,
    updated per-bounce ray tallies).

    Round-3 TPU optimizations (VERDICT #5), both estimator-neutral:
    - bounce 0 is PEELED out of the while_loop so its traversal can
      statically select the coherent-primary kernel config (the
      while_loop body must compile ONE intersect, so the flag can't
      vary inside it);
    - with sort_every=k > 0, live lanes are coherence-re-sorted (and
      dead lanes pushed to the packet tail) every k bounces: the
      megakernel analog of wavefront compaction. A permutation never
      changes any lane's RNG stream or arithmetic (key/orig ride
      along; results scatter back by orig), so images are
      bit-identical to the unsorted megakernel. Dead-lane packets
      cost ~2 kernel visits, so sorting recovers most of
      compaction's benefit without shrinking the queue.
    """
    key = _rng.make_key(
        _rng.make_key(jnp.asarray(seed, jnp.uint32),
                      jnp.asarray(sample_idx, jnp.uint32)), lane)
    o, d = generate_rays(cam, px, py, key)
    r = px.shape[0]
    done0 = jnp.zeros((r,), bool) if active is None else ~active
    state = PathState(
        o=o, d=d,
        att=splat((1.0, 1.0, 1.0), (r,)),
        rad=splat((0.0, 0.0, 0.0), (r,)),
        result=splat((0.0, 0.0, 0.0), (r,)),
        done=done0,
    )
    orig = jnp.arange(r, dtype=jnp.int32)

    # ---- bounce 0 peeled: primary-tuned kernel config ----
    if max_depth >= 1:
        rays = rays.at[0].add(jnp.sum((~state.done).astype(jnp.int32)))
        state = _trace.trace_step(scene, state, key, 2,  # ctr 0,1=jitter
                                  rr=rr, bounce_idx=0, primary=True)

    # Never-permuted key array: resort re-gathers each lane's key from
    # it by orig as a plain uint32 take. The key must NOT ride
    # _compact's packed take — that bitcasts int columns to f32, and
    # XLA:TPU canonicalizes NaN bit patterns in transit (measured,
    # trace.py _permute_packed); pcg2d keys are uniform uint32, so
    # ~2^-8 of lanes per sort would silently switch (and collide on
    # 0x7FC00000) RNG streams. Small ints (orig, done) are safe: their
    # bitcasts are denormal/low-normal patterns, which data movement
    # preserves (the wavefront has shipped q_id this way from round 1
    # with oracle-exact results).
    key0 = key

    def resort(st, key, orig):
        from sycl_ray_tracer_tpu.models.wavefront import (_compact,
                                                          _coherence_key)
        sk = _coherence_key(scene, st.o, st.d)
        if sk is None:
            return st, key, orig
        cols, _ = _compact(~st.done, [
            st.o.x, st.o.y, st.o.z, st.d.x, st.d.y, st.d.z,
            st.att.x, st.att.y, st.att.z,
            st.rad.x, st.rad.y, st.rad.z,
            st.result.x, st.result.y, st.result.z,
            orig, st.done.astype(jnp.int32)], r, sort_key=sk)
        st = PathState(
            o=V3(cols[0], cols[1], cols[2]),
            d=V3(cols[3], cols[4], cols[5]),
            att=V3(cols[6], cols[7], cols[8]),
            rad=V3(cols[9], cols[10], cols[11]),
            result=V3(cols[12], cols[13], cols[14]),
            done=cols[16] != 0)
        return st, jnp.take(key0, cols[15], axis=0), cols[15]

    def cond(carry):
        i, st, _, _, _ = carry
        return (i < max_depth) & jnp.any(~st.done)

    def body(carry):
        i, st, rays, key, orig = carry
        if sort_every:
            st, key, orig = jax.lax.cond(
                (i - 1) % sort_every == 0,
                resort, lambda s, k, g: (s, k, g), st, key, orig)
        rays = rays.at[i].add(jnp.sum((~st.done).astype(jnp.int32)))
        st = _trace.trace_step(scene, st, key, i + 2,
                               rr=rr, bounce_idx=i)
        return (i + 1, st, rays, key, orig)

    _, state, rays, key, orig = jax.lax.while_loop(
        cond, body, (jnp.int32(1), state, rays, key, orig))
    if sort_every:
        # undo the coherence permutation: results return to pixel order
        res = V3(*(jnp.zeros((r,), jnp.float32).at[orig].set(c)
                   for c in (state.result.x, state.result.y,
                             state.result.z)))
        return res, rays
    return state.result, rays


# Pixel-chunk size (chunks run sequentially via lax.map past this).
# Large chunks win: per-bounce-iteration cost is dominated by fixed
# kernel-scheduling overhead, so lanes are nearly free until
# multi-million sizes.
CHUNK = 1 << 20


def accumulate_megakernel(scene, cam: Camera, px, py, lane, *,
                          spp: int, max_depth: int, seed,
                          sample_offset=0, rr: bool = False,
                          sort_every: int = 0):
    """Linear-space accumulation over `spp` samples for the given pixel
    lanes. Returns (accum [R, 3] float32 — the SUM over samples, not the
    mean — and per-bounce ray counts [max_depth] int32)."""
    n = px.shape[0]
    c = min(CHUNK, n)
    pad = (-n) % c
    n_chunks = (n + pad) // c

    def padded(a, fill=0):
        if pad == 0:
            return a.reshape(n_chunks, c)
        return jnp.concatenate(
            [a, jnp.full((pad,), fill, a.dtype)]).reshape(n_chunks, c)

    px_c, py_c, lane_c = padded(px), padded(py), padded(lane)
    valid_c = padded(jnp.ones((n,), bool), False)

    def chunk_fn(args):
        cpx, cpy, clane, cvalid = args

        def sample_body(s, carry):
            (ax, ay, az), rays = carry
            color, rays = _sample_one(
                scene, cam, cpx, cpy, clane, s + sample_offset, seed,
                max_depth, rays, active=cvalid, rr=rr,
                sort_every=sort_every)
            return (ax + color.x, ay + color.y, az + color.z), rays

        zero = jnp.zeros((c,), jnp.float32)
        (ax, ay, az), rays = jax.lax.fori_loop(
            0, spp, sample_body,
            ((zero, zero, zero), jnp.zeros((max_depth,), jnp.int32)))
        return jnp.stack([ax, ay, az], axis=-1), rays

    accs, rayss = jax.lax.map(chunk_fn, (px_c, py_c, lane_c, valid_c))
    return accs.reshape(n_chunks * c, 3)[:n], rayss.sum(axis=0)


@functools.partial(jax.jit, static_argnames=("width", "height",
                                             "max_depth", "waves", "rr",
                                             "sort_every"))
def _wave_frame(scene, cam: Camera, seed, sample_offset, *, width: int,
                height: int, max_depth: int, waves: int = 1,
                rr: bool = False, sort_every: int = 0):
    """`waves` camera samples of the full frame in ONE device program
    (lane // n = sample within the batch, lane % n = pixel — the same
    global ray-id scheme as wavefront._gen_queue). Per-lane RNG keys
    depend only on (seed, absolute sample index, pixel), so any wave
    partition of spp produces bit-identical samples; the wave's results
    reduce over the sample axis before returning. Round 1 ran one
    program per sample (VERDICT: megakernel never got wave batching);
    batching amortizes the fixed per-bounce program overhead."""
    n = width * height
    lane = jnp.arange(waves * n, dtype=jnp.uint32)
    pix = lane % jnp.uint32(n)  # linear ray id, camera.hpp:120-122
    px = (pix % jnp.uint32(width)).astype(jnp.int32)
    py = (pix // jnp.uint32(width)).astype(jnp.int32)
    sample_idx = (jnp.asarray(sample_offset, jnp.uint32)
                  + lane // jnp.uint32(n))
    rays0 = jnp.zeros((max_depth,), jnp.int32)
    color, rays = _sample_one(scene, cam, px, py, pix, sample_idx,
                              seed, max_depth, rays0, rr=rr,
                              sort_every=sort_every)
    acc = jnp.stack([color.x, color.y, color.z], axis=-1)
    return acc.reshape(waves, n, 3).sum(axis=0), rays


def render_megakernel(scene, cam: Camera, *, width: int, height: int,
                      spp: int, max_depth: int, seed: int = 0,
                      rr: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (image [H, W, 3] float32 gamma-encoded,
    per-bounce ray counts [max_depth] int32 — sum on host for total).

    Host-driven wave loop (see render_wavefront's docstring) — one
    compiled device program per wave of up to SRT_WAVE_RAYS rays
    (default 8M; megakernel waves are smaller than wavefront's because
    there is no compaction to shed dead lanes), accumulator on device.
    """
    import os

    wave_rays = int(os.environ.get("SRT_WAVE_RAYS", str(8 << 20)))
    # Per-bounce coherence re-sort (see _sample_one): pays on the TPU
    # packet kernel (the sort is the same argsort+packed-take as
    # wavefront compaction); the CPU/XLA traversal gains nothing, so
    # default off there. SRT_MK_SORT=k sorts every k bounces (0=off).
    default_sort = 1 if jax.default_backend() == "tpu" else 0
    sort_every = int(os.environ.get("SRT_MK_SORT", str(default_sort)))
    n = width * height
    # The megakernel runs lanes x max_depth bounce iterations in ONE
    # device program; this box's runtime kills multi-minute single
    # executions (watchdog -> UNAVAILABLE + worker crash, observed at
    # 512^2 x 30 waves x depth 40). Cap lane-bounces per program so
    # deep-depth configs split into more, shorter waves.
    lane_bounces = int(os.environ.get("SRT_MK_LANE_BOUNCES",
                                      str(64 << 20)))
    # Treelet scenes chain tl_count kernel passes per bounce inside
    # the same program, so a lane-bounce there costs ~tl_count times a
    # single-tree one. The round-3 512^2 sweep hung the remote worker
    # on exactly this: minecraft_proc (4 treelets) at d30 hit the
    # watchdog at the 64M cap calibrated on single-tree scenes.
    lane_bounces //= max(1, getattr(scene, "tl_count", 0) or 1)
    waves = max(1, min(spp, wave_rays // n,
                       lane_bounces // max(n * max_depth, 1)))
    accum = None
    rays = None
    s = 0
    while s < spp:
        w = min(waves, spp - s)
        a, r = _wave_frame(scene, cam, seed, s, width=width,
                           height=height, max_depth=max_depth,
                           waves=w, rr=rr, sort_every=sort_every)
        accum = a if accum is None else accum + a
        rays = r if rays is None else rays + r
        s += w
    img = linear_to_gamma(accum * (1.0 / spp))
    return img.reshape(height, width, 3), rays
