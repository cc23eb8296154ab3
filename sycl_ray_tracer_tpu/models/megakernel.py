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


def _resort(scene, st: PathState, key0, orig, force: bool = False):
    """Coherence re-sort of a megakernel path state: live lanes sorted
    by the wavefront's coherence key, dead lanes to the tail. A pure
    permutation — every lane keeps its RNG stream (key re-gathered from
    the never-permuted key0 by the riding `orig` id) and its arithmetic,
    so images are bit-identical to the unsorted engine.

    `force=True` guarantees a live-first permutation even when the
    coherence key is disabled (SRT_SORT_KEY=none): the bounce-chunked
    driver needs dead lanes at the tail before it can shrink the queue,
    so it falls back to a stable argsort on the done flag. The payload
    must NOT go through _compact's sort_key=None path there — that one
    zero-fills dead rows, and a zeroed (orig, result) pair would later
    scatter 0 into pixel-slot 0.
    """
    from sycl_ray_tracer_tpu.models.wavefront import (_compact,
                                                      _coherence_key)
    sk = _coherence_key(scene, st.o, st.d)
    if sk is None:
        if not force:
            return st, jnp.take(key0, orig, axis=0), orig
        sk = jnp.zeros_like(orig, dtype=jnp.uint32)
    cols, _ = _compact(~st.done, [
        st.o.x, st.o.y, st.o.z, st.d.x, st.d.y, st.d.z,
        st.att.x, st.att.y, st.att.z,
        st.rad.x, st.rad.y, st.rad.z,
        st.result.x, st.result.y, st.result.z,
        orig, st.done.astype(jnp.int32)], orig.shape[0], sort_key=sk)
    st = PathState(
        o=V3(cols[0], cols[1], cols[2]),
        d=V3(cols[3], cols[4], cols[5]),
        att=V3(cols[6], cols[7], cols[8]),
        rad=V3(cols[9], cols[10], cols[11]),
        result=V3(cols[12], cols[13], cols[14]),
        done=cols[16] != 0)
    return st, jnp.take(key0, cols[15], axis=0), cols[15]


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
        return _resort(scene, st, key0, orig)

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

    # max_depth=0: the loop body can't even TRACE (rays.at[i] on a
    # size-0 tally array), and nothing would run — return the initial
    # black state, matching the reference's never-entered bounce loop.
    if max_depth < 1:
        return state.result, rays
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


def _q_of(st: PathState, orig):
    return (st.o.x, st.o.y, st.o.z, st.d.x, st.d.y, st.d.z,
            st.att.x, st.att.y, st.att.z, st.rad.x, st.rad.y, st.rad.z,
            st.result.x, st.result.y, st.result.z, orig, st.done)


def _st_of(q):
    return PathState(
        o=V3(q[0], q[1], q[2]), d=V3(q[3], q[4], q[5]),
        att=V3(q[6], q[7], q[8]), rad=V3(q[9], q[10], q[11]),
        result=V3(q[12], q[13], q[14]), done=q[16]), q[15]


def _chunk_loop(scene, st, orig, key, key0, rays, i_lo, i_hi, *,
                rr: bool, sort_every: int, final: bool = False):
    """Bounce iterations [i_lo, i_hi) of the megakernel body, with the
    re-sort AFTER each trace_step instead of before the next one — the
    identical operation stream (…step_i, resort_i, tally_{i+1},
    step_{i+1}…), just bracketed so every chunk ENDS live-first-sorted
    and the host can shrink the queue to the live bucket. The final
    iteration always sorts (force-compacted even under SRT_SORT_KEY=
    none / SRT_MK_SORT=0) because the shrink depends on it — except in
    the render's FINAL chunk (final=True, static), where no shrink or
    consumer follows and the forced sort would be a wasted argsort +
    packed take over the whole bucket."""
    def cond(c):
        i, st, _, _, _ = c
        return (i < i_hi) & jnp.any(~st.done)

    def body(c):
        i, st, orig, key, rays = c
        rays = rays.at[i].add(jnp.sum((~st.done).astype(jnp.int32)))
        st = _trace.trace_step(scene, st, key, i + 2, rr=rr,
                               bounce_idx=i)
        last = jnp.bool_(False) if final else (i + 1 >= i_hi)
        do = last if not sort_every else ((i % sort_every == 0) | last)
        st, key, orig = jax.lax.cond(
            do,
            lambda s, k, g: _resort(scene, s, key0, g, force=True),
            lambda s, k, g: (s, k, g), st, key, orig)
        return (i + 1, st, orig, key, rays)

    _, st, orig, key, rays = jax.lax.while_loop(
        cond, body, (i_lo, st, orig, key, rays))
    return st, orig, rays


def _scatter_results(res, st: PathState, orig):
    """Persist per-lane results into the full-wave-width slots by the
    riding global lane id. A SET, not an add: each lane owns one slot,
    live lanes write the zeros already there, dead lanes idempotently
    rewrite the value they carried — so the frame reduction
    reshape(waves, n).sum(axis=0) is bit-identical to the unchunked
    engine's, whose per-lane result array never moves."""
    rx, ry, rz = res
    return (rx.at[orig].set(st.result.x),
            ry.at[orig].set(st.result.y),
            rz.at[orig].set(st.result.z))


def _chunk_first_body(scene, cam: Camera, seed, sample_idx0, pix0,
                      i_hi, *, n_local: int, width: int,
                      max_depth: int, waves: int, rr: bool,
                      sort_every: int, final: bool = False):
    """Unjitted wave bring-up + bounces [0, i_hi): camera rays,
    per-lane keys, the peeled primary-config bounce 0, then the chunk
    loop. Parameterized on a GLOBAL pixel offset (pix0) and absolute
    sample offset (sample_idx0) so the sharded host loop
    (parallel/mesh.py) can run this same core per shard with
    shard-local pixel/sample slices while every (global pixel,
    absolute sample) draws the single-chip key stream. Returns
    (queue cols, result slots, tallies, key0, live count)."""
    r = waves * n_local
    lane = jnp.arange(r, dtype=jnp.uint32)
    pix = jnp.asarray(pix0, jnp.uint32) + lane % jnp.uint32(n_local)
    px = (pix % jnp.uint32(width)).astype(jnp.int32)
    py = (pix // jnp.uint32(width)).astype(jnp.int32)
    sample_idx = (jnp.asarray(sample_idx0, jnp.uint32)
                  + lane // jnp.uint32(n_local))
    key0 = _rng.make_key(
        _rng.make_key(jnp.asarray(seed, jnp.uint32), sample_idx), pix)
    o, d = generate_rays(cam, px, py, key0)
    st = PathState(
        o=o, d=d,
        att=splat((1.0, 1.0, 1.0), (r,)),
        rad=splat((0.0, 0.0, 0.0), (r,)),
        result=splat((0.0, 0.0, 0.0), (r,)),
        done=jnp.zeros((r,), bool))
    orig = jnp.arange(r, dtype=jnp.int32)
    rays = jnp.zeros((max_depth,), jnp.int32)

    # peeled bounce 0: static primary-tuned kernel config
    rays = rays.at[0].add(r)
    st = _trace.trace_step(scene, st, key0, 2, rr=rr, bounce_idx=0,
                           primary=True)
    key = key0
    if sort_every or not final:
        # the i=1 cadence sort (any sort_every >= 1 sorts pre-step 1);
        # under sort_every=0 it is only the shrink-enabling force, so
        # a final (single-chunk) render skips it
        st, key, orig = _resort(scene, st, key0, orig, force=True)

    st, orig, rays = _chunk_loop(scene, st, orig, key, key0, rays,
                                 jnp.int32(1), i_hi, rr=rr,
                                 sort_every=sort_every, final=final)
    zero = jnp.zeros((r,), jnp.float32)
    res = _scatter_results((zero, zero, zero), st, orig)
    live = jnp.sum((~st.done).astype(jnp.int32))
    return _q_of(st, orig), res, rays, key0, live


@functools.partial(jax.jit, static_argnames=(
    "width", "height", "max_depth", "waves", "rr", "sort_every",
    "final"),
    donate_argnums=())
def _chunk_first(scene, cam: Camera, seed, sample_offset, i_hi, *,
                 width: int, height: int, max_depth: int, waves: int,
                 rr: bool, sort_every: int, final: bool = False):
    """Single-chip jit wrapper over _chunk_first_body (whole frame,
    pixel offset 0)."""
    return _chunk_first_body(
        scene, cam, seed, sample_offset, jnp.uint32(0), i_hi,
        n_local=width * height, width=width, max_depth=max_depth,
        waves=waves, rr=rr, sort_every=sort_every, final=final)


def _chunk_next_body(scene, q, res, rays, key0, i_lo, i_hi, *,
                     rr: bool, sort_every: int, final: bool = False):
    """Unjitted bounces [i_lo, i_hi) on a shrunk queue (every input
    row is a real lane: the inter-chunk slice keeps a live-first-sorted
    prefix plus at most bucket-padding DEAD rows, whose done flag rides
    in the queue). Shared with the sharded host loop."""
    st, orig = _st_of(q)
    key = jnp.take(key0, orig, axis=0)
    st, orig, rays = _chunk_loop(scene, st, orig, key, key0, rays,
                                 i_lo, i_hi, rr=rr,
                                 sort_every=sort_every, final=final)
    res = _scatter_results(res, st, orig)
    live = jnp.sum((~st.done).astype(jnp.int32))
    return _q_of(st, orig), res, rays, live


@functools.partial(jax.jit, static_argnames=("rr", "sort_every",
                                             "final"),
                   donate_argnums=(1, 2, 3))
def _chunk_next(scene, q, res, rays, key0, i_lo, i_hi, *, rr: bool,
                sort_every: int, final: bool = False):
    """Single-chip jit wrapper over _chunk_next_body. Queue, result
    slots, and tallies are donated."""
    return _chunk_next_body(scene, q, res, rays, key0, i_lo, i_hi,
                            rr=rr, sort_every=sort_every, final=final)


def _chunked_wave(scene, cam: Camera, seed, s, w, *, width: int,
                  height: int, max_depth: int, rr: bool, chunk: int,
                  sort_every: int):
    """One wave of the bounce-chunked megakernel (SRT_MK_CHUNK=k).

    The fused engine's structural cost on TPU is that a traced
    while_loop has static shapes: shade/sort rows stay at full wave
    width while the live count decays, which is why the unchunked
    matrix rows fall off with depth (512^2 sponza_proc s128: 2.81 at
    d10 -> 0.91 at d50 while wavefront holds 3.5+). Chunking runs k
    fused bounce iterations per device program and shrinks the queue
    to the live-count bucket between programs — the TPU analog of the
    reference SIMT megakernel's dead threads retiring inside one
    kernel launch (render_megakernel.cpp:75-187). Estimator-exact:
    images are bit-identical to the unchunked engine (permutations +
    per-lane result slots; see _chunk_loop/_scatter_results), and the
    host sees one scalar per chunk instead of wavefront's one per
    bounce. Shorter programs also sit further under the runtime
    watchdog that a deep unchunked wave can hit (CLAUDE.md).

    Returns (linear accumulator [n, 3] summed over the wave's samples,
    per-bounce ray tallies)."""
    from sycl_ray_tracer_tpu.models.wavefront import (bucket_of,
                                                      shrink_queue)

    n = width * height
    r = w * n
    i_hi0 = min(chunk, max_depth)
    q, res, rays, key0, live = _chunk_first(
        scene, cam, seed, s, jnp.int32(i_hi0),
        width=width, height=height, max_depth=max_depth, waves=w,
        rr=rr, sort_every=sort_every, final=(i_hi0 >= max_depth))
    count = int(live)
    i0 = chunk
    while i0 < max_depth and count > 0:
        b = bucket_of(count, r)
        if q[0].shape[0] != b:
            q = shrink_queue(q, b=b)
        i_hi = min(i0 + chunk, max_depth)
        q, res, rays, live = _chunk_next(
            scene, q, res, rays, key0, jnp.int32(i0),
            jnp.int32(i_hi), rr=rr, sort_every=sort_every,
            final=(i_hi >= max_depth))
        count = int(live)
        i0 = i_hi
    return jnp.stack(res, axis=-1).reshape(w, n, 3).sum(axis=0), rays


def mk_cadence(scene, max_depth: int) -> Tuple[int, int, int]:
    """(chunk, sort_every, tl_chain) cadence policy — shared by the
    single-chip driver and the sharded host loop (parallel/mesh.py) so
    the two cannot drift.

    Per-bounce coherence re-sort (see _sample_one): pays on the TPU
    packet kernel (the sort is the same argsort+packed-take as
    wavefront compaction); the CPU/XLA traversal gains nothing, so
    default off there. SRT_MK_SORT=k sorts every k bounces (0=off).
    Cadence sweep (tools/tune_mk_cadence.py, PLAN_TPU round-3
    facts): every bounce wins through d30 (3.10 vs 2.95 at chunk3)
    but every-2 wins at d50 (2.79 vs 2.50 at chunk4) — late-bounce
    survival is high, so re-sorting barely shrinks-reorders anything
    and the argsort+take is pure cost. Crossover measured between
    d30 and d50; the default flips past the verified-shallow bound.
    Treelet scenes (tl_count > 1) take the deep-depth cadence at ALL
    depths: the 512^2 matrix showed minecraft_proc JUMPING 2.29 ->
    2.54 Mrays/s from d30 (chunk3/sort1) to d40 (chunk2/sort2) —
    deeper depth, higher rate — because every chained treelet pass
    repeats the dead-lane tax, so the tighter reslicing pays
    tl_count times while the extra sorts amortize over tl_count
    kernel passes (measured A/B at d10 s128: 2.45 -> 2.73, +11%;
    d20 2.34 -> 2.62, d30 2.29 -> 2.58 — PLAN_TPU round-3 facts).

    Bounce-chunked mode (see _chunked_wave): k fused bounce
    iterations per program, queue shrunk to the live bucket between
    programs. Default on TPU; SRT_MK_CHUNK=0 disables. Smaller chunks
    won the cadence sweep monotonically (d10: c3 3.51 > c2 3.44 > c4
    3.39 > c6 3.14 > c8 2.97; d50 at sort2: c2 2.87 > c3 2.81 > c4
    2.79 > c6 2.66): reslicing the queue more often beats fusing more
    bounces per program, and at deep depth the shrink compounds
    enough that chunk=2 overtakes 3. Treelet scenes take chunk=2 at
    all depths.
    """
    import os

    tl_chain = max(1, getattr(scene, "tl_count", 0) or 1)
    if jax.default_backend() == "tpu":
        shallow = max_depth <= 30 and tl_chain == 1
        default_sort = 1 if shallow else 2
        default_chunk = 3 if shallow else 2
    else:
        default_sort = 0
        default_chunk = 0
    sort_every = int(os.environ.get("SRT_MK_SORT", str(default_sort)))
    chunk = int(os.environ.get("SRT_MK_CHUNK", str(default_chunk)))
    return chunk, sort_every, tl_chain


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
    chunk, sort_every, tl_chain = mk_cadence(scene, max_depth)
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
    lane_bounces //= tl_chain
    # max_depth=0 renders black with zero rays (the reference's loop
    # never runs) — only the plain engine expresses that, so the
    # chunked path requires at least one bounce.
    if chunk > 0 and max_depth >= 1:
        bounces_per_program = min(chunk, max_depth)

        def per_wave(s, w):
            return _chunked_wave(scene, cam, seed, s, w, width=width,
                                 height=height, max_depth=max_depth,
                                 rr=rr, chunk=chunk,
                                 sort_every=sort_every)
    else:
        bounces_per_program = max_depth

        def per_wave(s, w):
            return _wave_frame(scene, cam, seed, s, width=width,
                               height=height, max_depth=max_depth,
                               waves=w, rr=rr, sort_every=sort_every)
    waves = max(1, min(spp, wave_rays // n,
                       lane_bounces // max(n * bounces_per_program, 1)))
    specs = []
    s = 0
    while s < spp:
        w = min(waves, spp - s)
        specs.append((s, w))
        s += w
    # The chunked megakernel blocks on one `int(live)` scalar per
    # chunk program; interleaving a second wave's programs fills that
    # gap (see wavefront.interleave_waves for the RPC rationale and
    # the bit-identity argument).
    from sycl_ray_tracer_tpu.models.wavefront import interleave_waves
    results = interleave_waves(per_wave, specs)
    accum = None
    rays = None
    for a, r in results:
        accum = a if accum is None else accum + a
        rays = r if rays is None else rays + r
    img = linear_to_gamma(accum * (1.0 / spp))
    return img.reshape(height, width, 3), rays
