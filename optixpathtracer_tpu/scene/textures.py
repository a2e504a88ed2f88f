"""Texture sampling: bilinear, wrap addressing, raw values then shader-side
sRGB decode - matching the reference's CUDA texture objects configured with
linear filter + wrap + sRGB off (`OptixRenderer.cpp:595-612`) and the
in-shader `SRGB8ToLinear` decode (`devicePrograms.cu:62-73`).
"""
from __future__ import annotations

import jax.numpy as jnp


def srgb_to_linear(c):
    """Per-channel sRGB EOTF (applied to ALL four channels including alpha,
    reproducing the reference's vec4 decode quirk, `devicePrograms.cu:62-73`).
    """
    a = c / 12.92
    b = ((c + 0.055) / 1.055) ** 2.4
    return jnp.where(c <= 0.04045, a, b)


def sample_bilinear(textures, tex_id, u, v):
    """Sample textures[tex_id] at (u, v) with wrap + bilinear filtering.

    textures: [K, R, R, 4]; tex_id: [...] int32 (invalid ids are clamped -
    callers mask by tex_id >= 0); u, v: [...] float.
    Follows CUDA's convention for normalized coords with linear filtering:
    texel centers at (i + 0.5) / R.
    """
    k, res = textures.shape[0], textures.shape[1]
    tid = jnp.clip(tex_id, 0, k - 1)

    # wrap to [0, 1)
    uu = u - jnp.floor(u)
    vv = v - jnp.floor(v)

    x = uu * res - 0.5
    y = vv * res - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    def _texel(xi, yi):
        xi = jnp.mod(xi.astype(jnp.int32), res)
        yi = jnp.mod(yi.astype(jnp.int32), res)
        return textures[tid, yi, xi]

    c00 = _texel(x0, y0)
    c10 = _texel(x0 + 1, y0)
    c01 = _texel(x0, y0 + 1)
    c11 = _texel(x0 + 1, y0 + 1)
    top = c00 * (1.0 - fx) + c10 * fx
    bot = c01 * (1.0 - fx) + c11 * fx
    return top * (1.0 - fy) + bot * fy
