"""Hit record for wavefront intersection queries."""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Hit(NamedTuple):
    """Closest-hit result per ray (analog of the reference's per-hit OptiX
    attributes: primitive id + barycentrics, `devicePrograms.cu:369-370,84-85`).
    """
    t: jnp.ndarray       # [...] hit distance; = tmax (miss sentinel) if none
    tri_id: jnp.ndarray  # [...] int32 triangle index; -1 if miss
    u: jnp.ndarray       # [...] barycentric u
    v: jnp.ndarray       # [...] barycentric v
    hit: jnp.ndarray     # [...] bool
    back_face: jnp.ndarray  # [...] bool (reference optixIsTriangleBackFaceHit)
