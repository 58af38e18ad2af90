"""Cubified axis-aligned bounding box.

The v5 reference computes this with a single CUDA thread scanning all N
particles (nbody_v5.cu:158-180) — an O(N) serial kernel.  On TPU it is two
`jnp` reductions that XLA lowers to a parallel tree reduction; under a
device mesh the reduction crosses chips automatically.

Semantics match nbody_v5.cu:172-178: per-axis minimum corner, one cube
side = the largest axis extent, upper corner = lo + size on every axis.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def bounding_cube(pos: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Return (lo[3], size) of the cubified AABB of `pos` [N,3].

    `size` is clamped to >= 1 exactly like the Morton kernel's guard
    `fmaxf(bounds[3]-bounds[0], 1.0f)` (nbody_v5.cu:72).
    """
    lo = jnp.min(pos, axis=0)
    hi = jnp.max(pos, axis=0)
    size = jnp.maximum(jnp.max(hi - lo), 1.0)
    return lo, size
