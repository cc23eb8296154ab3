"""Random direction sampling.

Matches the reference's *distribution* choices for converged-image parity:
``random_unit_vector`` is normalize(uniform cube in [-1,1]^3)
(xorshift.hpp:38-40) — deliberately NOT rejection-sampled or
cosine-weighted, because the oracle and the renderers must share the same
estimator for the RMSE gate to be meaningful.
"""

from __future__ import annotations

import numpy as np

from sycl_ray_tracer_tpu.ops import rng as _rng
from sycl_ray_tracer_tpu.ops.vec import V3, normalize

# Guards the measure-zero all-components-exactly-0.5 draw; perturbs
# directions by < 1e-9 relative, far below the 2e-3 RMSE budget.
_EPS = 1e-20


def random_unit_vector(key, counter) -> V3:
    u, v, w = _rng.uniform3(key, counter)
    cube = V3(u * 2.0 - 1.0, v * 2.0 - 1.0, w * 2.0 - 1.0)
    return normalize(cube, eps=_EPS)


def random_unit_vector_np(key, counter):
    u, v, w = _rng.uniform3_np(key, counter)
    vec = np.stack([u * 2.0 - 1.0, v * 2.0 - 1.0, w * 2.0 - 1.0], axis=-1)
    n = np.sqrt((vec * vec).sum(-1, keepdims=True) + _EPS)
    return vec / n
