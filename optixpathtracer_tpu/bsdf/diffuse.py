"""Lambertian diffuse BRDF (reference `PBRT/LambertDiffuse.h:86-140`).

f = albedo/pi in the upper hemisphere, cosine-weighted sampling via the
concentric disk map, pdf = cos(theta)/pi.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import rng
from ..core.math import INV_PI, abs_cos_theta, same_hemisphere
from .base import BSDFSample


def f(albedo, wo, wi):
    """albedo/pi when wo, wi share a hemisphere (`LambertDiffuse.h:86-92`)."""
    mask = same_hemisphere(wo, wi)
    return jnp.where(mask[..., None], albedo * INV_PI, 0.0)


def sample(seed, albedo, wo, reflection=True):
    """Cosine-hemisphere importance sample (`LambertDiffuse.h:110-132`).

    Note: like the reference, the sampled direction is always in the +z
    hemisphere regardless of wo (callers flip by hemisphere convention).
    """
    seed, d = rng.sample_cosine_hemisphere(seed)
    # z is already >= 0 from the construction; reference also force-flips.
    d = d.at[..., 2].set(jnp.abs(d[..., 2]))
    pdf_val = abs_cos_theta(d) * INV_PI
    shape = wo.shape[:-1]
    valid = jnp.broadcast_to(jnp.asarray(reflection), shape) & (pdf_val > 0.0)
    return seed, BSDFSample(
        color=jnp.broadcast_to(albedo * INV_PI, shape + (3,)),
        direction=d,
        pdf=pdf_val,
        valid=valid,
        reflection=jnp.ones(shape, bool),
        transmission=jnp.zeros(shape, bool),
        specular=jnp.zeros(shape, bool),
        glossy=jnp.zeros(shape, bool),
    )


def pdf(wo, wi, reflection=True):
    """cos(theta)/pi in the shared hemisphere (`LambertDiffuse.h:134-140`)."""
    ok = same_hemisphere(wo, wi) & jnp.asarray(reflection)
    return jnp.where(ok, abs_cos_theta(wi) * INV_PI, 0.0)
