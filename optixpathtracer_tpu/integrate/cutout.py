"""Alpha-cutout-aware intersection: the wavefront equivalent of the
reference's anyhit programs (`devicePrograms.cu:518-561` AlphaCutout: hits
whose albedo-texture alpha < 0.9 after sRGB decode are ignored, for both
radiance and shadow rays).

OptiX re-enters traversal on optixIgnoreIntersection; the wavefront analog
is a bounded re-trace: find the closest hit, evaluate the albedo alpha at
the hit point, and for cut-out lanes re-trace with tmin just past the hit.
MAX_CUTOUT_LAYERS bounds the unrolled passes (transparent layers beyond
that occlude). Only compiled in when the scene actually contains cutout
texels (scene_uses_alpha_cutout - a static flatten-time fact), so opaque
scenes pay nothing.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..intersect import intersect_closest
from ..intersect.types import Hit
from ..scene.textures import sample_bilinear, srgb_to_linear

MAX_CUTOUT_LAYERS = 4
ALPHA_THRESHOLD = 0.9
REENTRY_EPS = 1e-4


def scene_uses_alpha_cutout(scene) -> bool:
    """Static: any material with an albedo texture containing alpha < 0.9?
    (The reference applies cutout whenever hasAlbedoTexture,
    `devicePrograms.cu:534`; we additionally skip the machinery when every
    texel is opaque - identical images, less work.)"""
    tex_ids = np.asarray(scene.mat_albedo_tex)
    if not (tex_ids >= 0).any():
        return False
    textures = np.asarray(scene.textures)
    used = np.unique(tex_ids[tex_ids >= 0])
    # the threshold applies to the sRGB-decoded alpha (reference decodes all
    # 4 channels, `devicePrograms.cu:62-73,543`)
    alpha = textures[used, :, :, 3]
    decoded = np.where(alpha <= 0.04045, alpha / 12.92,
                       ((alpha + 0.055) / 1.055) ** 2.4)
    return bool((decoded < ALPHA_THRESHOLD).any())


def _hit_alpha(scene, hit: Hit):
    """Decoded albedo alpha at the hit point; 1.0 where the material has no
    albedo texture (no cutout, `devicePrograms.cu:534,546`)."""
    safe_id = jnp.maximum(hit.tri_id, 0)
    tri_uv = scene.tri_uvs[safe_id]
    mat_id = scene.tri_mat[safe_id]
    tex_id = scene.mat_albedo_tex[mat_id]
    u = hit.u[..., None]
    v = hit.v[..., None]
    uv = (1.0 - u - v) * tri_uv[:, 0] + u * tri_uv[:, 1] + v * tri_uv[:, 2]
    texel = sample_bilinear(scene.textures, tex_id, uv[..., 0], uv[..., 1])
    alpha = srgb_to_linear(texel[..., 3])
    return jnp.where(tex_id >= 0, alpha, 1.0)


def intersect_closest_cutout(scene, o, d, tmin=0.0, tmax=100.0,
                             method="auto"):
    """Closest hit skipping cutout surfaces (radiance-ray anyhit analog).

    Each re-trace layer is gated two ways (measured 5x on the hall scene,
    where the naive version re-traced the full wavefront 4 extra times):
      * `lax.cond` on 'any lane cut' skips whole layers at runtime - the
        common case once the first opaque hit lands;
      * non-cut lanes re-trace with tmax = -1 (the dead-lane convention the
        Pallas kernels already cull by block), so a layer only pays for
        the blocks that actually contain cut lanes.
    """
    r = o.shape[0]
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (r,))
    tmax_b = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))
    best = intersect_closest(scene, o, d, tmin, tmax, method=method)
    for _ in range(MAX_CUTOUT_LAYERS):
        cut = best.hit & (_hit_alpha(scene, best) < ALPHA_THRESHOLD)

        def retrace(best, cut=cut):
            new_tmin = jnp.where(cut, best.t + REENTRY_EPS, tmin)
            lane_tmax = jnp.where(cut, tmax_b, -1.0)
            again = intersect_closest(scene, o, d, new_tmin, lane_tmax,
                                      method=method)
            return Hit(*[jnp.where(cut, a, b) for a, b in zip(again, best)])

        best = jax.lax.cond(jnp.any(cut), retrace, lambda b: b, best)
    return best


def intersect_any_cutout(scene, o, d, tmin=0.0, tmax=100.0, method="auto"):
    """Occlusion query honoring cutout (shadow-ray anyhit analog,
    `devicePrograms.cu:556-561`): a ray is blocked only by a hit whose
    alpha passes the threshold. Layers past the first are runtime-gated as
    in intersect_closest_cutout."""
    r = o.shape[0]
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (r,))
    tmax_b = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))
    cur_tmin = tmin
    blocked = jnp.zeros((r,), bool)
    open_ = jnp.ones((r,), bool)  # still searching

    def step(state, lane_gate):
        blocked, open_, cur_tmin = state
        lane_tmax = jnp.where(lane_gate, tmax_b, -1.0)
        hit = intersect_closest(scene, o, d, cur_tmin, lane_tmax,
                                method=method)
        opaque = hit.hit & (_hit_alpha(scene, hit) >= ALPHA_THRESHOLD)
        blocked = blocked | (open_ & opaque)
        # keep searching only through cutout hits
        open_ = open_ & hit.hit & ~opaque
        cur_tmin = jnp.where(open_, hit.t + REENTRY_EPS, cur_tmin)
        return blocked, open_, cur_tmin

    state = step((blocked, open_, cur_tmin), open_)
    for _ in range(MAX_CUTOUT_LAYERS):
        state = jax.lax.cond(jnp.any(state[1]),
                             lambda s: step(s, s[1]), lambda s: s, state)
    blocked, open_, _ = state
    # layers beyond the bound conservatively occlude
    return blocked | open_
