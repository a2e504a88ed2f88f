"""Pallas TPU kernels for ray-triangle intersection.

The TPU-native replacement for the reference's RT-core `optixTrace`
(SURVEY.md section 7 stage 3). Two-level "cluster-culled sweep" design:

  * Rays are laid out 2-D across the full VPU tile - [RAY_SUB, 128] blocks
    (RAY_SUB sublanes x 128 lanes), so every vector op processes
    RAY_SUB*128 rays. (A ray-per-sublane [R, 1] layout would waste 127/128
    lanes and drown in tiny grid-step DMAs.)
  * Triangles ride in SMEM as scalar component rows, consumed by an
    in-kernel fori_loop: each step broadcasts one triangle's 9 scalars
    against the whole ray block (scalar-unit loads overlap VPU math).
  * Triangles arrive in BVH leaf order (scene/flatten.py reorders them), so
    every TRI_CHUNK-sized chunk is spatially coherent. Each chunk carries a
    precomputed cluster AABB; the kernel slab-tests the ray block against
    it (bounded by the running best-t) and `pl.when`-skips the whole
    triangle loop when no ray can hit - the TPU analog of BVH culling,
    with zero divergence inside a block.

Grid = (ray_blocks, tri_chunks), chunk axis fastest; the per-ray running
(best_t, best_id) lives in a VMEM output block that Pallas keeps resident
across the whole chunk sweep. Outputs are only (t, tri_id); barycentrics
and backface are recomputed differentiably by api._refine.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .types import Hit

LANES = 128
RAY_SUB = 32          # sublanes per ray block -> 32*128 = 4096 rays/step
TRI_CHUNK = 128       # triangles per SMEM chunk == culling cluster size
                      # (Mosaic SMEM blocks need a 128-divisible last dim)
EPS_DET = 1e-12
BIG = 3.4e38  # python float: jnp constants would be captured as consts

_N_RAY = 11  # ox oy oz dx dy dz inv_dx inv_dy inv_dz tmin tmax
_N_TRI = 9   # v0x v0y v0z e1x e1y e1z e2x e2y e2z
_N_BOX = 6   # cluster AABB min/max xyz


def _cluster_test(rays, box, j, best_t):
    """Slab-test the ray block against chunk j's cluster AABB, bounded by
    the per-ray running best-t. Returns a scalar 'any ray can hit'.
    `box` refs hold the full [1, n_chunks] rows in SMEM (full-array blocks:
    Mosaic only pipelines SMEM blocks with 128-divisible last dims)."""
    ox, oy, oz = rays[0][:], rays[1][:], rays[2][:]
    idx, idy, idz = rays[6][:], rays[7][:], rays[8][:]
    tmin, tmax = rays[9][:], rays[10][:]
    bnx, bny, bnz = box[0][0, j], box[1][0, j], box[2][0, j]
    bxx, bxy, bxz = box[3][0, j], box[4][0, j], box[5][0, j]

    tx0 = (bnx - ox) * idx
    tx1 = (bxx - ox) * idx
    ty0 = (bny - oy) * idy
    ty1 = (bxy - oy) * idy
    tz0 = (bnz - oz) * idz
    tz1 = (bxz - oz) * idz
    t_near = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                     jnp.minimum(ty0, ty1)),
                         jnp.minimum(tz0, tz1))
    t_far = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                    jnp.maximum(ty0, ty1)),
                        jnp.maximum(tz0, tz1))
    limit = jnp.minimum(tmax, best_t)
    can_hit = (t_near <= t_far) & (t_far >= tmin) & (t_near <= limit)
    return jnp.max(can_hit.astype(jnp.int32)) > 0


def _mt_scalar_tri(rays, tris, k, bt):
    """Moller-Trumbore of triangle k (SMEM scalars) against the ray block.
    Returns (t, hit) with t = BIG where no closer hit."""
    ox, oy, oz = rays[0][:], rays[1][:], rays[2][:]
    dx, dy, dz = rays[3][:], rays[4][:], rays[5][:]
    tmin = rays[9][:]

    v0x = tris[0][0, k]
    v0y = tris[1][0, k]
    v0z = tris[2][0, k]
    e1x = tris[3][0, k]
    e1y = tris[4][0, k]
    e1z = tris[5][0, k]
    e2x = tris[6][0, k]
    e2y = tris[7][0, k]
    e2z = tris[8][0, k]

    # pvec = d x e2 (e2 scalar): vector-scalar products only
    pvx = dy * e2z - dz * e2y
    pvy = dz * e2x - dx * e2z
    pvz = dx * e2y - dy * e2x
    det = e1x * pvx + e1y * pvy + e1z * pvz
    ok = jnp.abs(det) > EPS_DET
    inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    tvx = ox - v0x
    tvy = oy - v0y
    tvz = oz - v0z
    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
    qvx = tvy * e1z - tvz * e1y
    qvy = tvz * e1x - tvx * e1z
    qvz = tvx * e1y - tvy * e1x
    v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
    t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
    hit = (ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
           & (t > tmin) & (t < bt))
    return t, hit


def _closest_kernel(*refs):
    rays = refs[:_N_RAY]
    box = refs[_N_RAY:_N_RAY + _N_BOX]
    tris = refs[_N_RAY + _N_BOX:_N_RAY + _N_BOX + _N_TRI]
    best_t, best_id = refs[_N_RAY + _N_BOX + _N_TRI:]
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        best_t[:] = jnp.full_like(best_t[:], BIG)
        best_id[:] = jnp.full_like(best_id[:], -1)

    # tmax bound applied here once (best_t starts at BIG)
    tmax = rays[10][:]

    @pl.when(_cluster_test(rays, box, j, jnp.minimum(best_t[:], tmax)))
    def _sweep():
        def body(k, carry):
            bt, bi = carry
            t, hit = _mt_scalar_tri(rays, tris, k, jnp.minimum(bt, tmax))
            better = hit & (t < bt)
            bt = jnp.where(better, t, bt)
            bi = jnp.where(better, j * TRI_CHUNK + k, bi)
            return bt, bi

        bt, bi = jax.lax.fori_loop(0, TRI_CHUNK, body,
                                   (best_t[:], best_id[:]))
        best_t[:] = bt
        best_id[:] = bi


def _any_kernel(*refs):
    rays = refs[:_N_RAY]
    box = refs[_N_RAY:_N_RAY + _N_BOX]
    tris = refs[_N_RAY + _N_BOX:_N_RAY + _N_BOX + _N_TRI]
    (blocked,) = refs[_N_RAY + _N_BOX + _N_TRI:]
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        blocked[:] = jnp.zeros_like(blocked[:])

    tmax = rays[10][:]
    # skip the chunk when every ray is already blocked or misses the box
    open_t = jnp.where(blocked[:] > 0, -BIG, tmax)

    @pl.when(_cluster_test(rays, box, j, open_t))
    def _sweep():
        def body(k, blk):
            t, hit = _mt_scalar_tri(rays, tris, k, tmax)
            return jnp.maximum(blk, hit.astype(jnp.int32))

        blocked[:] = jax.lax.fori_loop(0, TRI_CHUNK, body, blocked[:])


def _pad_plane(x, n, fill):
    """Pad [R] to [n] and reshape to the [n // LANES, LANES] ray plane."""
    pad = n - x.shape[0]
    if pad:
        x = jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])
    return x.reshape(n // LANES, LANES)


def _pad_row(x, n, fill):
    pad = n - x.shape[0]
    if pad:
        x = jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])
    return x[None, :]


def _safe_inv(d):
    tiny = jnp.where(d >= 0, jnp.float32(1e-20), jnp.float32(-1e-20))
    return 1.0 / jnp.where(jnp.abs(d) < 1e-20, tiny, d)


def _prep(scene, o, d, tmin, tmax):
    r = o.shape[0]
    t_tris = scene.tri_v0.shape[0]
    block = RAY_SUB * LANES
    r_pad = pl.cdiv(r, block) * block
    t_pad = pl.cdiv(t_tris, TRI_CHUNK) * TRI_CHUNK
    n_chunks = t_pad // TRI_CHUNK

    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (r,))
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))

    rays = []
    for k in range(3):
        rays.append(_pad_plane(o[:, k], r_pad, 0.0))
    for k in range(3):
        rays.append(_pad_plane(d[:, k], r_pad, 1.0))
    for k in range(3):
        rays.append(_pad_plane(_safe_inv(d[:, k]), r_pad, 1.0))
    rays.append(_pad_plane(tmin, r_pad, 0.0))
    rays.append(_pad_plane(tmax, r_pad, -1.0))  # padding rays: no hits

    # Cluster AABBs over real triangles. Invalid/padding triangles use
    # reduction-neutral fills (+BIG for min, -BIG for max); chunks that end
    # up fully empty (inverted box) are then rewritten to a degenerate
    # min=max=BIG point box whose slab test yields t_near=t_far ~1e38 > any
    # tmax, so the cull always rejects them. (Leaving the inverted
    # [BIG, -BIG] box would NOT work: the min/max-swapped slab test turns it
    # into an all-encompassing box that defeats the cull.)
    v0 = scene.tri_v0
    v1 = v0 + scene.tri_e1
    v2 = v0 + scene.tri_e2
    valid = scene.tri_valid[:, None]
    bb_min = jnp.where(valid, jnp.minimum(jnp.minimum(v0, v1), v2), BIG)
    bb_max = jnp.where(valid, jnp.maximum(jnp.maximum(v0, v1), v2), -BIG)
    pad_t = t_pad - t_tris
    if pad_t:
        bb_min = jnp.concatenate(
            [bb_min, jnp.full((pad_t, 3), BIG, jnp.float32)])
        bb_max = jnp.concatenate(
            [bb_max, jnp.full((pad_t, 3), -BIG, jnp.float32)])
    c_min = bb_min.reshape(n_chunks, TRI_CHUNK, 3).min(axis=1)
    c_max = bb_max.reshape(n_chunks, TRI_CHUNK, 3).max(axis=1)
    empty = (c_min[:, :1] > c_max[:, :1])  # no valid tri in chunk
    c_min = jnp.where(empty, BIG, c_min)
    c_max = jnp.where(empty, BIG, c_max)
    box = [c_min[:, 0][None, :], c_min[:, 1][None, :], c_min[:, 2][None, :],
           c_max[:, 0][None, :], c_max[:, 1][None, :], c_max[:, 2][None, :]]

    tris = []
    for arr in (scene.tri_v0, scene.tri_e1, scene.tri_e2):
        fill = 1e10 if arr is scene.tri_v0 else 0.0
        for k in range(3):
            tris.append(_pad_row(arr[:, k], t_pad, fill))
    return rays, box, tris, r, r_pad, n_chunks


def _specs(r_pad, n_chunks):
    ray_spec = pl.BlockSpec((RAY_SUB, LANES), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    box_spec = pl.BlockSpec((1, n_chunks), lambda i, j: (0, 0),
                            memory_space=pltpu.SMEM)
    tri_spec = pl.BlockSpec((1, TRI_CHUNK), lambda i, j: (0, j),
                            memory_space=pltpu.SMEM)
    out_spec = pl.BlockSpec((RAY_SUB, LANES), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    grid = (r_pad // (RAY_SUB * LANES), n_chunks)
    in_specs = ([ray_spec] * _N_RAY + [box_spec] * _N_BOX
                + [tri_spec] * _N_TRI)
    return grid, in_specs, out_spec


@functools.partial(jax.jit, static_argnames=())
def intersect_closest_raw(scene, o, d, tmin=0.0, tmax=100.0):
    """Cluster-culled Pallas closest-hit: (t, tri_id) per ray (t = BIG on
    miss)."""
    rays, box, tris, r, r_pad, n_chunks = _prep(scene, o, d, tmin, tmax)
    grid, in_specs, out_spec = _specs(r_pad, n_chunks)

    best_t, best_id = pl.pallas_call(
        _closest_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((r_pad // LANES, LANES), jnp.float32),
            jax.ShapeDtypeStruct((r_pad // LANES, LANES), jnp.int32)],
    )(*rays, *box, *tris)
    return best_t.reshape(-1)[:r], best_id.reshape(-1)[:r]


def intersect_closest(scene, o, d, tmin=0.0, tmax=100.0):
    """Hit-record wrapper matching the brute/bvh engine interface."""
    best_t, best_id = intersect_closest_raw(scene, o, d, tmin, tmax)
    # reject padded-triangle ids
    n_real = scene.tri_valid.shape[0]
    valid = (best_id >= 0) & (best_id < n_real) & scene.tri_valid[
        jnp.clip(best_id, 0, n_real - 1)]
    tmax_arr = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32),
                                o.shape[:-1])
    return Hit(t=jnp.where(valid, best_t, tmax_arr),
               tri_id=jnp.where(valid, best_id, -1),
               u=jnp.zeros_like(best_t), v=jnp.zeros_like(best_t),
               hit=valid, back_face=jnp.zeros_like(valid))


@functools.partial(jax.jit, static_argnames=())
def intersect_any(scene, o, d, tmin=0.0, tmax=100.0):
    """Cluster-culled Pallas occlusion query: True where any triangle
    blocks."""
    rays, box, tris, r, r_pad, n_chunks = _prep(scene, o, d, tmin, tmax)
    grid, in_specs, out_spec = _specs(r_pad, n_chunks)

    blocked = pl.pallas_call(
        _any_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((r_pad // LANES, LANES), jnp.int32),
    )(*rays, *box, *tris)
    return blocked.reshape(-1)[:r] > 0
