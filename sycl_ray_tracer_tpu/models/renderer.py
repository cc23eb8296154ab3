"""Renderer protocol + registry (render.hpp:11-18 equivalent).

The reference exposes both engines behind `IRenderer::render_frame`;
here both are functions with one shared signature, registered by name
so drivers (CLI, bench, tests) select them uniformly.
"""

from __future__ import annotations

from typing import Callable, Dict, Protocol, Tuple

import jax.numpy as jnp

from sycl_ray_tracer_tpu.models.camera import Camera


class Renderer(Protocol):
    def __call__(self, scene, cam: Camera, *, width: int, height: int,
                 spp: int, max_depth: int,
                 seed: int = 0) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (gamma-encoded image [H, W, 3] f32,
        per-bounce ray counts [max_depth] i32)."""
        ...


def get_renderer(name: str) -> Renderer:
    from sycl_ray_tracer_tpu.models.megakernel import render_megakernel
    from sycl_ray_tracer_tpu.models.wavefront import render_wavefront

    table: Dict[str, Renderer] = {
        "megakernel": render_megakernel,
        "wavefront": render_wavefront,
    }
    if name not in table:
        raise KeyError(f"unknown renderer {name!r}; "
                       f"choices: {sorted(table)}")
    return table[name]
