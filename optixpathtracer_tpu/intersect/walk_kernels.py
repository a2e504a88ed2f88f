"""Hierarchical (BVH-guided) Pallas TPU intersection kernels.

The TPU-native replacement for the reference's hardware RT-core traversal
(`devicePrograms.cu:248` `optixTrace`, GAS build `OptixRenderer.cpp:306-456`)
for large scenes, where the dense cluster-culled sweep
(intersect/pallas_kernels.py) degrades to O(#chunks) per ray block.

Two-kernel "block traversal, lane intersection" design, built ONLY from the
standard Mosaic pipeline (BlockSpec index maps + scalar prefetch - manual
in-kernel `make_async_copy` DMAs fault on the target runtime, measured):

  1. **Traversal kernel** (grid over ray blocks): walks the SMEM-resident
     chunk-level skip-link BVH (scene/bvh.py `build_chunk_bvh`, leaf = one
     128..1024-triangle chunk) with a scalar `lax.while_loop`. Each node's
     AABB is slab-tested against the whole [RAY_SUB, 128] ray block bounded
     by tmax and reduced to one scalar "any ray can hit"; inner-node hit
     descends (i+1), miss/leaf follows the skip link. Surviving leaves'
     chunk ids are appended to a per-block candidate list (SMEM output),
     in DFS = quasi front-to-back order.
  2. **Sweep kernel** (grid = ray blocks x max candidates): the dense
     cluster-culled sweep, but the triangle-chunk axis is REMAPPED through
     the candidate list with `PrefetchScalarGridSpec`: the tri-chunk
     BlockSpec index_map reads `cand[i, j]`, so the pipeline only ever DMAs
     candidate chunks. Entries past the candidate count repeat the last
     real chunk id - the pipeline skips re-fetching an unchanged block, so
     tail steps cost only a predicated-off grid step. Each live candidate
     is additionally slab-tested against the per-ray running best-t
     (front-to-back culling), then swept with the scalar-broadcast
     Moller-Trumbore from pallas_kernels.

Block aggregation means incoherent ray blocks keep the union of their
candidates; pair with the octant/Morton binning in integrate/path.py for
bounce rays.

Outputs match pallas_kernels: (t, tri_id) only; barycentrics/backface are
recomputed differentiably by api._refine.
"""
from __future__ import annotations



import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .types import Hit
from .pallas_kernels import (LANES, RAY_SUB, BIG, _mt_scalar_tri, _pad_plane,
                             _pad_row, _safe_inv)

_N_RAY = 11  # ox oy oz dx dy dz inv_dx inv_dy inv_dz tmin tmax
_N_BOX = 6
_N_TRI = 9


def _node_test(rays, node_box, i, limit):
    """Slab-test the ray block against node i's AABB (SMEM scalar reads),
    bounded per-ray by `limit`. Returns scalar 'any ray can hit'."""
    ox, oy, oz = rays[0][:], rays[1][:], rays[2][:]
    idx, idy, idz = rays[6][:], rays[7][:], rays[8][:]
    tmin = rays[9][:]
    bnx, bny, bnz = node_box[0, i], node_box[1, i], node_box[2, i]
    bxx, bxy, bxz = node_box[3, i], node_box[4, i], node_box[5, i]

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
    can_hit = (t_near <= t_far) & (t_far >= tmin) & (t_near <= limit)
    return jnp.max(can_hit.astype(jnp.int32)) > 0


# ---------------------------------------------------------------------------
# Kernel 1: chunk-BVH traversal -> per-block candidate chunk list
# ---------------------------------------------------------------------------

def _make_traverse_kernel(n_nodes: int, maxc_pad: int):
    # NOTE: cand/count SMEM outputs are mapped as ONE whole-array block
    # (constant index map) revisited by every grid step, with rows indexed
    # by program_id inside the kernel - Mosaic rejects (1, N) blocks over a
    # (g, N) SMEM array (sublane dim must be 8-divisible or whole).
    def kernel(*refs):
        rays = refs[:_N_RAY]
        node_box = refs[_N_RAY]
        node_link = refs[_N_RAY + 1]
        cand_ref, count_ref = refs[_N_RAY + 2:]
        blk = pl.program_id(0)

        tmax = rays[10][:]

        def cond(state):
            i, _ = state
            return i < n_nodes

        def body(state):
            i, n_found = state
            is_leaf = node_link[2, i] == 1
            skip = node_link[0, i]
            any_hit = _node_test(rays, node_box, i, tmax)
            found = any_hit & is_leaf

            @pl.when(found)
            def _append():
                cand_ref[blk, n_found] = node_link[1, i]

            nxt = jnp.where(any_hit & (~is_leaf), i + 1, skip)
            return nxt, n_found + found.astype(jnp.int32)

        _, n_found = jax.lax.while_loop(cond, body, (jnp.int32(0),
                                                     jnp.int32(0)))
        count_ref[blk, 0] = n_found

        # Pad the tail with the last real candidate (chunk 0 if none): the
        # sweep pipeline sees an unchanged index and skips the re-fetch.
        last = jnp.where(n_found > 0, cand_ref[blk, jnp.maximum(n_found - 1,
                                                                0)], 0)

        def pad_body(k, _):
            @pl.when(k >= n_found)
            def _w():
                cand_ref[blk, k] = last
            return 0

        jax.lax.fori_loop(0, maxc_pad, pad_body, 0)

    return kernel


# ---------------------------------------------------------------------------
# Kernel 2: candidate-remapped cluster-culled sweep (scalar prefetch)
# ---------------------------------------------------------------------------

def _cluster_test_chunk(rays, box, c, best_t):
    """pallas_kernels._cluster_test but indexed by a dynamic chunk id."""
    ox, oy, oz = rays[0][:], rays[1][:], rays[2][:]
    idx, idy, idz = rays[6][:], rays[7][:], rays[8][:]
    tmin, tmax = rays[9][:], rays[10][:]
    bnx, bny, bnz = box[0][0, c], box[1][0, c], box[2][0, c]
    bxx, bxy, bxz = box[3][0, c], box[4][0, c], box[5][0, c]

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


def _make_sweep_kernel(chunk: int):
    def kernel(cand_ref, count_ref, *refs):
        rays = refs[:_N_RAY]
        box = refs[_N_RAY:_N_RAY + _N_BOX]
        tris = refs[_N_RAY + _N_BOX:_N_RAY + _N_BOX + _N_TRI]
        best_t, best_id = refs[_N_RAY + _N_BOX + _N_TRI:]
        i = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            best_t[:] = jnp.full_like(best_t[:], BIG)
            best_id[:] = jnp.full_like(best_id[:], -1)

        c = cand_ref[i, j]
        live = j < count_ref[i, 0]
        tmax = rays[10][:]

        @pl.when(live & _cluster_test_chunk(rays, box, c,
                                            jnp.minimum(best_t[:], tmax)))
        def _sweep():
            def body(k, carry):
                bt, bi = carry
                t, hit = _mt_scalar_tri(rays, tris, k, jnp.minimum(bt, tmax))
                better = hit & (t < bt)
                bt = jnp.where(better, t, bt)
                bi = jnp.where(better, c * chunk + k, bi)
                return bt, bi

            bt, bi = jax.lax.fori_loop(0, chunk, body,
                                       (best_t[:], best_id[:]))
            best_t[:] = bt
            best_id[:] = bi

    return kernel


def _make_any_sweep_kernel(chunk: int):
    def kernel(cand_ref, count_ref, *refs):
        rays = refs[:_N_RAY]
        box = refs[_N_RAY:_N_RAY + _N_BOX]
        tris = refs[_N_RAY + _N_BOX:_N_RAY + _N_BOX + _N_TRI]
        (blocked,) = refs[_N_RAY + _N_BOX + _N_TRI:]
        i = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            blocked[:] = jnp.zeros_like(blocked[:])

        c = cand_ref[i, j]
        live = j < count_ref[i, 0]
        tmax = rays[10][:]
        open_t = jnp.where(blocked[:] > 0, -BIG, tmax)

        @pl.when(live & _cluster_test_chunk(rays, box, c, open_t))
        def _sweep():
            def body(k, blk):
                t, hit = _mt_scalar_tri(rays, tris, k, tmax)
                return jnp.maximum(blk, hit.astype(jnp.int32))

            blocked[:] = jax.lax.fori_loop(0, chunk, body, blocked[:])

    return kernel


# ---------------------------------------------------------------------------
# Host wrappers
# ---------------------------------------------------------------------------

GROUP_BLOCKS = 16  # ray blocks per pallas call: bounds the scalar-prefetch
                   # candidate table (GROUP_BLOCKS * n_chunks int32) in SMEM;
                   # bigger wavefronts lax.map over groups of this size.


def _prep_rays(o, d, tmin, tmax):
    """Pad rays to a whole number of GROUP_BLOCKS-sized groups and lay them
    out as [n_groups, rows, LANES] planes."""
    r = o.shape[0]
    block = RAY_SUB * LANES
    n_blocks = pl.cdiv(r, block)
    g = min(GROUP_BLOCKS, n_blocks)
    n_groups = pl.cdiv(n_blocks, g)
    r_pad = n_groups * g * block
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
    rows = g * RAY_SUB
    rays = [p.reshape(n_groups, rows, LANES) for p in rays]
    return rays, r, g, n_groups


def _pad_nodes(scene):
    """Pad the SMEM node arrays to a 128-divisible last dim (Mosaic SMEM
    block requirement). Padding nodes are never visited: traversal is
    bounded by the real node count."""
    box = scene.walk_node_box
    link = scene.walk_node_link
    n = box.shape[1]
    n_pad = pl.cdiv(max(n, 1), LANES) * LANES
    if n_pad != n:
        box = jnp.concatenate(
            [box, jnp.full((6, n_pad - n), BIG, box.dtype)], axis=1)
        link = jnp.concatenate(
            [link, jnp.full((3, n_pad - n), n, link.dtype)], axis=1)
    return box, link, n


def _walk_geometry(scene):
    """Tri component rows + chunk AABB rows in WALK order, derived from the
    packed walk arrays (walk_tris [C, 9, CHUNK]; leaf AABBs pulled from the
    chunk-BVH nodes, so nothing re-reduces over triangles per call)."""
    c = scene.walk_tris.shape[0]
    chunk = scene.walk_tris.shape[2]
    tris = [scene.walk_tris[:, comp, :].reshape(1, c * chunk)
            for comp in range(_N_TRI)]
    link = scene.walk_node_link
    boxn = scene.walk_node_box
    is_leaf = link[2] == 1
    # leaf node position of every chunk: scatter node index by chunk id
    # (mode="drop" so inner nodes, mapped out of range, scatter nowhere)
    node_of_chunk = jnp.zeros((c,), jnp.int32).at[
        jnp.where(is_leaf, link[1], c)].set(
        jnp.arange(link.shape[1], dtype=jnp.int32), mode="drop")
    box = [boxn[row][node_of_chunk][None, :] for row in range(_N_BOX)]
    return tris, box, c, chunk


def _check_walkable(scene):
    if scene.walk_tris.shape[0] == 0:
        raise ValueError(
            "scene has no walk arrays (flattened with build_bvh=False); "
            "the hierarchical walk kernel needs build_bvh=True")


def _candidates(scene, rays_g, g):
    """Run the traversal kernel on one ray group: candidate chunk lists."""
    box, link, n_nodes = _pad_nodes(scene)
    c = scene.walk_tris.shape[0]
    maxc_pad = pl.cdiv(c, LANES) * LANES

    ray_spec = pl.BlockSpec((RAY_SUB, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    box_spec = pl.BlockSpec((6, box.shape[1]), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)
    link_spec = pl.BlockSpec((3, link.shape[1]), lambda i: (0, 0),
                             memory_space=pltpu.SMEM)
    cand_spec = pl.BlockSpec((g, maxc_pad), lambda i: (0, 0),
                             memory_space=pltpu.SMEM)
    count_spec = pl.BlockSpec((g, LANES), lambda i: (0, 0),
                              memory_space=pltpu.SMEM)

    cand, count = pl.pallas_call(
        _make_traverse_kernel(n_nodes, maxc_pad),
        grid=(g,),
        in_specs=[ray_spec] * _N_RAY + [box_spec, link_spec],
        out_specs=[cand_spec, count_spec],
        out_shape=[
            jax.ShapeDtypeStruct((g, maxc_pad), jnp.int32),
            jax.ShapeDtypeStruct((g, LANES), jnp.int32)],
    )(*rays_g, box, link)
    return cand, count, maxc_pad


def _sweep_specs(g, n_chunks, chunk, maxc_pad):
    # index maps receive (i, j, cand_ref, count_ref) under scalar prefetch
    ray_spec = pl.BlockSpec((RAY_SUB, LANES),
                            lambda i, j, cand, cnt: (i, 0),
                            memory_space=pltpu.VMEM)
    box_spec = pl.BlockSpec((1, n_chunks), lambda i, j, cand, cnt: (0, 0),
                            memory_space=pltpu.SMEM)
    tri_spec = pl.BlockSpec((1, chunk),
                            lambda i, j, cand, cnt: (0, cand[i, j]),
                            memory_space=pltpu.SMEM)
    out_spec = pl.BlockSpec((RAY_SUB, LANES),
                            lambda i, j, cand, cnt: (i, 0),
                            memory_space=pltpu.VMEM)
    grid = (g, maxc_pad)
    in_specs = ([ray_spec] * _N_RAY + [box_spec] * _N_BOX
                + [tri_spec] * _N_TRI)
    return grid, in_specs, out_spec


@jax.jit
def intersect_closest_raw(scene, o, d, tmin=0.0, tmax=100.0):
    """Hierarchical Pallas closest-hit: (t, tri_id) per ray (t=BIG on
    miss)."""
    _check_walkable(scene)
    rays, r, g, n_groups = _prep_rays(o, d, tmin, tmax)
    tris, box, n_chunks, chunk = _walk_geometry(scene)
    grid, in_specs, out_spec = _sweep_specs(g, n_chunks, chunk,
                                            pl.cdiv(n_chunks, LANES) * LANES)

    def one_group(rays_g):
        cand, count, maxc_pad = _candidates(scene, rays_g, g)
        return pl.pallas_call(
            _make_sweep_kernel(chunk),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=grid,
                in_specs=in_specs,
                out_specs=[out_spec, out_spec],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((g * RAY_SUB, LANES), jnp.float32),
                jax.ShapeDtypeStruct((g * RAY_SUB, LANES), jnp.int32)],
        )(cand, count, *rays_g, *box, *tris)

    if n_groups == 1:
        best_t, best_id = one_group([p[0] for p in rays])
    else:
        best_t, best_id = jax.lax.map(
            lambda planes: one_group(list(planes)), tuple(rays))
    return best_t.reshape(-1)[:r], best_id.reshape(-1)[:r]


def intersect_closest(scene, o, d, tmin=0.0, tmax=100.0):
    """Hit-record wrapper matching the brute/bvh/pallas engine interface."""
    best_t, best_id = intersect_closest_raw(scene, o, d, tmin, tmax)
    n_real = scene.tri_valid.shape[0]
    # walk tri ids live in the walk-padded index space, which shares the
    # real-triangle prefix with the flat arrays (flatten packs both from the
    # same reordered triangle list)
    valid = (best_id >= 0) & (best_id < n_real) & scene.tri_valid[
        jnp.clip(best_id, 0, n_real - 1)]
    tmax_arr = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32),
                                o.shape[:-1])
    return Hit(t=jnp.where(valid, best_t, tmax_arr),
               tri_id=jnp.where(valid, best_id, -1),
               u=jnp.zeros_like(best_t), v=jnp.zeros_like(best_t),
               hit=valid, back_face=jnp.zeros_like(valid))


@jax.jit
def intersect_any(scene, o, d, tmin=0.0, tmax=100.0):
    """Hierarchical Pallas occlusion query."""
    _check_walkable(scene)
    rays, r, g, n_groups = _prep_rays(o, d, tmin, tmax)
    tris, box, n_chunks, chunk = _walk_geometry(scene)
    grid, in_specs, out_spec = _sweep_specs(g, n_chunks, chunk,
                                            pl.cdiv(n_chunks, LANES) * LANES)

    def one_group(rays_g):
        cand, count, maxc_pad = _candidates(scene, rays_g, g)
        return pl.pallas_call(
            _make_any_sweep_kernel(chunk),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=grid,
                in_specs=in_specs,
                out_specs=out_spec,
            ),
            out_shape=jax.ShapeDtypeStruct((g * RAY_SUB, LANES), jnp.int32),
        )(cand, count, *rays_g, *box, *tris)

    if n_groups == 1:
        blocked = one_group([p[0] for p in rays])
    else:
        blocked = jax.lax.map(lambda planes: one_group(list(planes)),
                              tuple(rays))
    return blocked.reshape(-1)[:r] > 0
