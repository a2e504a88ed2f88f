"""Hierarchical (BVH-guided) Pallas TPU intersection kernels.

The TPU-native replacement for the reference's hardware RT-core traversal
(`devicePrograms.cu:248` `optixTrace`, GAS build `OptixRenderer.cpp:306-456`)
for large scenes, where the dense cluster-culled sweep
(intersect/pallas_kernels.py) degrades to O(#chunks) per ray block.

Two-phase "block candidates, lane intersection" design:

  1. **Candidate phase** (plain jnp, on device - `_candidates`): EXACT
     per-ray slab tests of every ray against every chunk AABB, dense on
     the VPU, OR-reduced to per-block candidate unions and **sorted
     front-to-back** by conservative entry distance. (Rounds 2-4 walked
     the chunk-level skip-link BVH with a scalar-core Pallas kernel here;
     the dense exact test is both faster - the serial walk cost 12-31 ms
     per 65k wavefront vs 1-3 ms dense - and tighter, since interval
     frustum tests over-admit on incoherent blocks. The chunk BVH
     (scene/bvh.py) still defines the spatially-coherent triangle
     layout.)
  2. **Sweep kernel** (grid over ray blocks): a scalar `while_loop` over
     the candidate list, fetching each candidate chunk's triangles from
     HBM with a double-buffered `make_async_copy` DMA into SMEM scratch
     and sweeping them with the scalar-broadcast Moller-Trumbore from
     pallas_kernels against per-ray running best-t. Because candidates
     arrive near-first, the loop **exits** as soon as the next candidate's
     t_near exceeds every ray's current best-t (the wavefront analog of
     ordered BVH descent + early termination that RT cores do in
     hardware); chunks that survive the exit test are still skipped
     per-chunk when no ray in the block can improve on them.

The sweep does O(candidates actually needed) work per block - there is no
dense grid over chunk slots, so scene size only enters through the chunk
tests and the chunk fetches a block really needs.

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
from .pallas_kernels import LANES, BIG, _pad_plane, _safe_inv

import os as _os

RAY_SUB = int(_os.environ.get("OPT_WALK_RAY_SUB", "8"))
# sublanes per walk ray block (8 -> 1024 rays). Smaller than the dense
# kernel's 32: a block's traversal work is the UNION of its rays' needs,
# so narrower cones cut candidates/ray; [8, 128] is the native VPU tile.
_N_RAY = 11  # ox oy oz dx dy dz inv_dx inv_dy inv_dz tmin tmax
_N_BOX = 6
EPS_DET = 1e-12
_DMA_DEPTH = 4  # chunk-fetch ring slots in the sweep kernels
_DMA_AHEAD = 3  # candidates prefetched ahead of the sweep pointer


# ---------------------------------------------------------------------------
# Kernel 2: sorted-candidate DMA sweep (per ray block, dynamic trip count)
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


def _mt_smem_tri(rays, tri_ref, k, bt):
    """Moller-Trumbore of triangle k (SMEM scratch [16, CHUNK] scalars,
    rows 0-8 = v0/e1/e2 xyz) against the ray block. Returns (t, hit) -
    mirrors pallas_kernels._mt_scalar_tri with the chunked tri layout.

    The best-so-far bound `bt` is INCLUSIVE (t <= bt) while the ray's tmax
    stays strict (t < tmax): candidates sweep in t_near order, not id
    order, so matching the brute oracle's lowest-id winner on coincident
    geometry requires the caller's (t == bt) & (cid < bi) tie-break to be
    reachable."""
    ox, oy, oz = rays[0][:], rays[1][:], rays[2][:]
    dx, dy, dz = rays[3][:], rays[4][:], rays[5][:]
    tmin = rays[9][:]
    tmax = rays[10][:]

    v0x = tri_ref[0, k]
    v0y = tri_ref[1, k]
    v0z = tri_ref[2, k]
    e1x = tri_ref[3, k]
    e1y = tri_ref[4, k]
    e1z = tri_ref[5, k]
    e2x = tri_ref[6, k]
    e2y = tri_ref[7, k]
    e2z = tri_ref[8, k]

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
           & (t > tmin) & (t <= bt) & (t < tmax))
    return t, hit


def _make_sweep_kernel(chunk: int):
    # cand/tnear/count ride as whole (g, N) SMEM blocks (constant index
    # map) with rows picked by program_id - Mosaic rejects (1, N) blocks
    # over (g, N) SMEM arrays.
    def kernel(*refs):
        cand_ref, tnear_ref, count_ref = refs[:3]
        rays = refs[3:3 + _N_RAY]
        box = refs[3 + _N_RAY:3 + _N_RAY + _N_BOX]
        hbm_tris = refs[3 + _N_RAY + _N_BOX]
        best_t, best_id = refs[3 + _N_RAY + _N_BOX + 1:]
        blk = pl.program_id(0)

        n = count_ref[blk, 0]
        tmax = rays[10][:]

        # The running (bt, bi) live in VMEM *scratch*; the output refs are
        # written once at the end (outputs stay write-only, scratch is
        # plainly read-write across the dynamic loop).
        def scoped(bt_s, bi_s, scratch, sems):
            bt_s[:] = jnp.full_like(bt_s[:], BIG)
            bi_s[:] = jnp.full_like(bi_s[:], -1)

            def get_dma(slot, j):
                return pltpu.make_async_copy(
                    hbm_tris.at[cand_ref[blk, j]], scratch.at[slot],
                    sems.at[slot])

            # 4-deep DMA ring, 3 candidates ahead: hides the per-copy
            # latency that dominated dead candidates at depth 2 (the
            # bandwidth is trivial - the latency is the cost).
            for k in range(_DMA_AHEAD):
                @pl.when(k < n)
                def _prologue(k=k):
                    get_dma(k, k).start()

            def cond(state):
                j, cont = state
                return cont

            def body(state):
                j, _ = state
                slot = jax.lax.rem(j, _DMA_DEPTH)
                get_dma(slot, j).wait()
                c = cand_ref[blk, j]
                has_next = j + 1 < n

                @pl.when(j + _DMA_AHEAD < n)
                def _prefetch():
                    get_dma(jax.lax.rem(j + _DMA_AHEAD, _DMA_DEPTH),
                            j + _DMA_AHEAD).start()

                @pl.when(_cluster_test_chunk(rays, box, c, bt_s[:]))
                def _sweep():
                    def tri_body(k, carry):
                        bt, bi = carry
                        t, hit = _mt_smem_tri(rays, scratch.at[slot], k, bt)
                        # tie-break toward the lowest triangle id so walk
                        # results are bit-identical to the brute oracle on
                        # coincident geometry regardless of sweep order
                        # (hit allows t == bt; see _mt_smem_tri)
                        cid = c * chunk + k
                        better = hit & ((t < bt)
                                        | ((t == bt) & (cid < bi)))
                        bt = jnp.where(better, t, bt)
                        bi = jnp.where(better, cid, bi)
                        return bt, bi

                    bt, bi = jax.lax.fori_loop(0, chunk, tri_body,
                                               (bt_s[:], bi_s[:]))
                    bt_s[:] = bt
                    bi_s[:] = bi

                # Early exit: candidates are sorted by block t_near; once
                # the next one starts beyond every ray's best hit, no
                # remaining chunk can contribute.
                blk_limit = jnp.max(jnp.minimum(bt_s[:], tmax))
                nxt = jnp.minimum(j + 1, n - 1)  # clamp: OOB-safe read
                cont = has_next & (tnear_ref[blk, nxt] <= blk_limit)
                return j + 1, cont

            j_end, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), n > 0))

            # Drain un-consumed prefetches if the early exit fired.
            for k in range(_DMA_AHEAD):
                @pl.when(j_end + k < jnp.minimum(n, j_end + _DMA_AHEAD))
                def _drain(k=k):
                    get_dma(jax.lax.rem(j_end + k, _DMA_DEPTH),
                            j_end + k).wait()

            best_t[:] = bt_s[:]
            best_id[:] = bi_s[:]

        pl.run_scoped(scoped,
                      pltpu.VMEM((RAY_SUB, LANES), jnp.float32),
                      pltpu.VMEM((RAY_SUB, LANES), jnp.int32),
                      pltpu.SMEM((_DMA_DEPTH, 16, chunk), jnp.float32),
                      pltpu.SemaphoreType.DMA((_DMA_DEPTH,)))

    return kernel


def _make_any_sweep_kernel(chunk: int):
    def kernel(*refs):
        cand_ref, tnear_ref, count_ref = refs[:3]
        rays = refs[3:3 + _N_RAY]
        box = refs[3 + _N_RAY:3 + _N_RAY + _N_BOX]
        hbm_tris = refs[3 + _N_RAY + _N_BOX]
        (blocked,) = refs[3 + _N_RAY + _N_BOX + 1:]
        blk = pl.program_id(0)

        n = count_ref[blk, 0]
        tmax = rays[10][:]

        def scoped(blk_s, scratch, sems):
            blk_s[:] = jnp.zeros_like(blk_s[:])

            def get_dma(slot, j):
                return pltpu.make_async_copy(
                    hbm_tris.at[cand_ref[blk, j]], scratch.at[slot],
                    sems.at[slot])

            for k in range(_DMA_AHEAD):
                @pl.when(k < n)
                def _prologue(k=k):
                    get_dma(k, k).start()

            def cond(state):
                j, cont = state
                return cont

            def body(state):
                j, _ = state
                slot = jax.lax.rem(j, _DMA_DEPTH)
                get_dma(slot, j).wait()
                c = cand_ref[blk, j]
                has_next = j + 1 < n

                @pl.when(j + _DMA_AHEAD < n)
                def _prefetch():
                    get_dma(jax.lax.rem(j + _DMA_AHEAD, _DMA_DEPTH),
                            j + _DMA_AHEAD).start()

                # skip the chunk when every ray is already blocked or
                # misses its AABB
                open_t = jnp.where(blk_s[:] > 0, -BIG, tmax)

                @pl.when(_cluster_test_chunk(rays, box, c, open_t))
                def _sweep():
                    def tri_body(k, acc):
                        # bound=BIG: occlusion needs any t in (tmin, tmax);
                        # the strict t < tmax lives inside _mt_smem_tri
                        t, hit = _mt_smem_tri(rays, scratch.at[slot], k,
                                              BIG)
                        return jnp.maximum(acc, hit.astype(jnp.int32))

                    blk_s[:] = jax.lax.fori_loop(0, chunk, tri_body,
                                                 blk_s[:])

                # exit once every ray is blocked (occlusion needs any hit)
                all_blocked = jnp.min(blk_s[:]) > 0
                cont = has_next & (~all_blocked)
                return j + 1, cont

            j_end, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), n > 0))

            for k in range(_DMA_AHEAD):
                @pl.when(j_end + k < jnp.minimum(n, j_end + _DMA_AHEAD))
                def _drain(k=k):
                    get_dma(jax.lax.rem(j_end + k, _DMA_DEPTH),
                            j_end + k).wait()

            blocked[:] = blk_s[:]

        pl.run_scoped(scoped,
                      pltpu.VMEM((RAY_SUB, LANES), jnp.int32),
                      pltpu.SMEM((_DMA_DEPTH, 16, chunk), jnp.float32),
                      pltpu.SemaphoreType.DMA((_DMA_DEPTH,)))

    return kernel


# ---------------------------------------------------------------------------
# Host wrappers
# ---------------------------------------------------------------------------

_MORT_O = 5  # origin Morton bits/axis in the coherence key
_MORT_D = 4  # direction Morton bits/axis


def _spread3(x, bits):
    out = jnp.zeros_like(x)
    for b in range(bits):
        out = out | (((x >> b) & 1) << (3 * b))
    return out


def _coherence_perm(scene, o, d):
    """Permutation packing spatially-coherent rays into the same
    [RAY_SUB, 128] block, so each block's BVH traversal sees a tight
    frustum. Key = direction octant | origin Morton | direction Morton:
    bounce wavefronts group by surface locality first; primary rays (one
    shared origin) fall through to the direction bits, which tile the
    image into compact view cones - the wavefront analog of the ray
    binning stage in GPU megakernel tracers. Without this, a 4096-ray
    block of consecutive scanline pixels spans a frustum as wide as the
    whole viewport and its candidate list approaches the entire scene
    (measured: 137 ms -> see WALK_BENCH.json for the sorted numbers)."""
    nb = scene.walk_node_box
    root_min = jnp.stack([nb[0, 0], nb[1, 0], nb[2, 0]])
    root_max = jnp.stack([nb[3, 0], nb[4, 0], nb[5, 0]])
    ext = jnp.maximum(root_max - root_min, 1e-6)
    so = float(1 << _MORT_O)
    qo = jnp.clip((o - root_min) / ext * so, 0.0, so - 1.0).astype(jnp.uint32)
    om = (_spread3(qo[:, 0], _MORT_O) | (_spread3(qo[:, 1], _MORT_O) << 1)
          | (_spread3(qo[:, 2], _MORT_O) << 2))
    sd = float(1 << _MORT_D)
    qd = jnp.clip((d * 0.5 + 0.5) * sd, 0.0, sd - 1.0).astype(jnp.uint32)
    dm = (_spread3(qd[:, 0], _MORT_D) | (_spread3(qd[:, 1], _MORT_D) << 1)
          | (_spread3(qd[:, 2], _MORT_D) << 2))
    octant = ((d[:, 0] >= 0).astype(jnp.uint32)
              | ((d[:, 1] >= 0).astype(jnp.uint32) << 1)
              | ((d[:, 2] >= 0).astype(jnp.uint32) << 2))
    key = (octant << 27) | (om << 12) | dm
    return jnp.argsort(key)


GROUP_BLOCKS = 32  # max ray blocks per pallas call; the candidate table
                   # (g * maxc_pad * 8 bytes) the sweep kernel keeps
                   # whole in SMEM caps it further (_group_size); bigger
                   # wavefronts lax.map over groups.
_SMEM_CAND_BUDGET = 192 * 1024  # bytes of SMEM granted to cand+tnear
_SMEM_TOTAL_BUDGET = 512 * 1024  # conservative per-kernel SMEM envelope:
                                 # every footprint below it has compiled on
                                 # v5e; larger configs get trimmed (or
                                 # rejected) here instead of failing in
                                 # Mosaic with an allocation error


def _group_size(n_blocks, n_chunks, chunk=0):
    """Ray blocks per pallas call, bounded so the WHOLE per-kernel SMEM
    footprint fits _SMEM_TOTAL_BUDGET - not just the cand/tnear table:
    the sweep kernel also holds 6 chunk-box rows (24 B/chunk) and the
    [_DMA_DEPTH, 16, chunk] f32 DMA scratch."""
    maxc_pad = pl.cdiv(max(n_chunks, 1), LANES) * LANES
    per_g = maxc_pad * 8 + LANES * 4          # cand + tnear + count row
    fixed = n_chunks * _N_BOX * 4 + _DMA_DEPTH * 16 * chunk * 4
    if fixed + per_g > _SMEM_TOTAL_BUDGET:
        raise ValueError(
            f"walk kernel SMEM footprint {fixed + per_g} B exceeds the "
            f"{_SMEM_TOTAL_BUDGET} B budget even at one block/group "
            f"({n_chunks} chunks x {chunk} tris); "
            "lower scene/flatten.py MAX_WALK_CHUNKS or the chunk size")
    g_cap = max(1, _SMEM_CAND_BUDGET // (maxc_pad * 8))
    g_total = max(1, (_SMEM_TOTAL_BUDGET - fixed) // per_g)
    return min(GROUP_BLOCKS, g_cap, g_total, n_blocks)


def _prep_rays(o, d, tmin, tmax, n_chunks, chunk=0):
    """Pad rays to a whole number of group-sized chunks and lay them
    out as [n_groups, rows, LANES] planes."""
    r = o.shape[0]
    block = RAY_SUB * LANES
    n_blocks = pl.cdiv(r, block)
    g = _group_size(n_blocks, n_chunks, chunk)
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


def _chunk_boxes(scene):
    """Chunk AABB rows in WALK order, pulled from the chunk-BVH leaf nodes
    (so nothing re-reduces over triangles per call)."""
    c = scene.walk_tris.shape[0]
    link = scene.walk_node_link
    boxn = scene.walk_node_box
    is_leaf = link[2] == 1
    # leaf node position of every chunk: scatter node index by chunk id
    # (mode="drop" so inner nodes, mapped out of range, scatter nowhere)
    node_of_chunk = jnp.zeros((c,), jnp.int32).at[
        jnp.where(is_leaf, link[1], c)].set(
        jnp.arange(link.shape[1], dtype=jnp.int32), mode="drop")
    box = [boxn[row][node_of_chunk][None, :] for row in range(_N_BOX)]
    return box, c, scene.walk_tris.shape[2]


def _check_walkable(scene):
    if scene.walk_tris.shape[0] == 0:
        raise ValueError(
            "scene has no walk arrays (flattened with build_bvh=False); "
            "the hierarchical walk kernel needs build_bvh=True")


def _make_cand_kernel(block_rays: int, n_tiles: int):
    """Per-block exact candidate entries, role-flipped: CHUNKS ride the
    vector lanes ([n_tiles, 128] covers every chunk AABB in a handful of
    register rows) while RAYS are a scalar fori_loop reading 8 SMEM
    scalars each. The per-chunk accumulator (min entry distance over
    passing rays, BIG = none) stays entirely in a VMEM register - no
    cross-lane reductions, no per-chunk scalar writes (a chunk-scalar
    variant with a jnp.min reduce per chunk measured 22 ms vs 12 for
    plain jnp; this layout has zero scalar<->vector sync in the loop).
    Dead rays (tmax < 0) skip via pl.when."""
    def kernel(*refs):
        rays = refs[:8]           # ox oy oz ix iy iz tmin tmax [g, R] SMEM
        box = refs[8]             # [6, n_tiles, LANES] VMEM
        entry_ref = refs[9]       # [1, n_tiles, LANES] VMEM out block
        blk = pl.program_id(0)

        bnx, bny, bnz = box[0], box[1], box[2]
        bxx, bxy, bxz = box[3], box[4], box[5]

        def scoped(acc):
            acc[:] = jnp.full_like(acc[:], BIG)

            def body(r, _):
                tmx = rays[7][blk, r]

                @pl.when(tmx >= 0.0)
                def _live():
                    ox, oy, oz = (rays[0][blk, r], rays[1][blk, r],
                                  rays[2][blk, r])
                    ix, iy, iz = (rays[3][blk, r], rays[4][blk, r],
                                  rays[5][blk, r])
                    tmn = rays[6][blk, r]
                    tx0 = (bnx - ox) * ix
                    tx1 = (bxx - ox) * ix
                    ty0 = (bny - oy) * iy
                    ty1 = (bxy - oy) * iy
                    tz0 = (bnz - oz) * iz
                    tz1 = (bxz - oz) * iz
                    t_near = jnp.maximum(
                        jnp.maximum(jnp.minimum(tx0, tx1),
                                    jnp.minimum(ty0, ty1)),
                        jnp.minimum(tz0, tz1))
                    t_far = jnp.minimum(
                        jnp.minimum(jnp.maximum(tx0, tx1),
                                    jnp.maximum(ty0, ty1)),
                        jnp.maximum(tz0, tz1))
                    can = (t_near <= t_far) & (t_far >= tmn) \
                        & (t_near <= tmx)
                    acc[:] = jnp.minimum(
                        acc[:], jnp.where(can, jnp.maximum(t_near, 0.0),
                                          BIG))
                return 0

            jax.lax.fori_loop(0, block_rays, body, 0)
            entry_ref[0] = acc[:]

        pl.run_scoped(scoped, pltpu.VMEM((n_tiles, LANES), jnp.float32))

    return kernel


_CAND_SMEM_BUDGET = 384 * 1024  # SMEM for the candidate kernel's ray
                                # scalars (8 planes x block_rays x 4 B per
                                # block; whole [g_c, R] arrays resident)


def _candidates(scene, rays_g, g):
    """Per-block candidate chunk lists, sorted front-to-back by
    conservative entry distance.

    Round-5 implementation: EXACT per-ray slab tests of every ray against
    every chunk AABB (a Pallas kernel: vector test per chunk, grid over
    blocks), reduced to per-block unions and argsorted by entry distance
    in jnp. This replaces the rounds-2..4 scalar-core BVH traversal
    kernel: the candidate arrays are statically [g, maxc_pad] either way,
    the dense test costs ~C x 45 VPU cycles per block (~3 ms per 65k
    wavefront on hall) while the serial per-block BVH walk cost 12-31 ms
    AND emitted conservative interval unions - the exact per-ray test is
    what hardware descent would pass, so the union is as tight as block
    aggregation allows. (A pure-jnp dense version measured 12 ms - XLA
    materializes the [rays, chunks] intermediates through HBM; the kernel
    keeps them in registers.) The chunk-level skip-link BVH (scene/bvh.py)
    still orders the triangle layout; only the per-wavefront walk of it
    is gone."""
    box, c, chunk = _chunk_boxes(scene)
    maxc_pad = pl.cdiv(c, LANES) * LANES
    rows = rays_g[0].shape[0]
    ray_rows = rows // g
    block_rays = ray_rows * LANES
    n_tiles = maxc_pad // LANES

    box6 = jnp.concatenate(box, axis=0)                    # [6, C]
    if maxc_pad != c:
        box6 = jnp.pad(box6, ((0, 0), (0, maxc_pad - c)))
    box3 = box6.reshape(6, n_tiles, LANES)

    # rays as per-block scalar rows [g, block_rays] (ray = row*128+lane)
    plane_ids = (0, 1, 2, 6, 7, 8, 9, 10)  # o, inv_d, tmin, tmax
    srays = [rays_g[k].reshape(g, block_rays) for k in plane_ids]

    g_c = max(1, min(g, _CAND_SMEM_BUDGET // (block_rays * 4 * 8)))
    ray_spec = pl.BlockSpec((g_c, block_rays), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)
    box_spec = pl.BlockSpec((6, n_tiles, LANES), lambda i: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    entry_spec = pl.BlockSpec((1, n_tiles, LANES), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)

    def call(sub):
        return pl.pallas_call(
            _make_cand_kernel(block_rays, n_tiles),
            grid=(g_c,),
            in_specs=[ray_spec] * 8 + [box_spec],
            out_specs=entry_spec,
            out_shape=jax.ShapeDtypeStruct((g_c, n_tiles, LANES),
                                           jnp.float32),
        )(*sub, box3)

    if g_c == g:
        entry = call(srays)
    else:
        n_sub = pl.cdiv(g, g_c)
        g_pad = n_sub * g_c
        srays = [jnp.pad(p, ((0, g_pad - g), (0, 0)),
                         constant_values=-1.0) if g_pad != g else p
                 for p in srays]
        stacked = [p.reshape(n_sub, g_c, block_rays) for p in srays]
        entry = jax.lax.map(lambda planes: call(list(planes)),
                            tuple(stacked))
        entry = entry.reshape(g_pad, n_tiles, LANES)[:g]
    entry = entry.reshape(g, maxc_pad)
    if maxc_pad != c:
        # padded chunk slots carry garbage boxes; force them empty
        entry = entry.at[:, c:].set(BIG)

    order = jnp.argsort(entry, axis=1)
    cand = jnp.take_along_axis(
        jnp.broadcast_to(jnp.arange(maxc_pad, dtype=jnp.int32),
                         (g, maxc_pad)), order, axis=1)
    tnear = jnp.take_along_axis(entry, order, axis=1)
    count = (entry < BIG).sum(axis=1, dtype=jnp.int32)
    count_full = jnp.zeros((g, LANES), jnp.int32).at[:, 0].set(count)
    return cand, tnear, count_full, maxc_pad


def _sweep_specs(g, n_chunks, maxc_pad):
    cand_spec = pl.BlockSpec((g, maxc_pad), lambda i: (0, 0),
                             memory_space=pltpu.SMEM)
    count_spec = pl.BlockSpec((g, LANES), lambda i: (0, 0),
                              memory_space=pltpu.SMEM)
    ray_spec = pl.BlockSpec((RAY_SUB, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    box_spec = pl.BlockSpec((1, n_chunks), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)
    tri_spec = pl.BlockSpec(memory_space=pl.ANY)  # stays in HBM, DMA'd
    out_spec = pl.BlockSpec((RAY_SUB, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    in_specs = ([cand_spec, cand_spec, count_spec] + [ray_spec] * _N_RAY
                + [box_spec] * _N_BOX + [tri_spec])
    return (g,), in_specs, out_spec


@jax.jit
def intersect_closest_raw(scene, o, d, tmin=0.0, tmax=100.0):
    """Hierarchical Pallas closest-hit: (t, tri_id) per ray (t=BIG on
    miss)."""
    _check_walkable(scene)
    r0 = o.shape[0]
    perm = _coherence_perm(scene, o, d)
    o, d = o[perm], d[perm]
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (r0,))[perm]
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r0,))[perm]
    box, n_chunks, chunk = _chunk_boxes(scene)
    rays, r, g, n_groups = _prep_rays(o, d, tmin, tmax, n_chunks, chunk)

    def one_group(rays_g):
        cand, tnear, count, maxc_pad = _candidates(scene, rays_g, g)
        grid, in_specs, out_spec = _sweep_specs(g, n_chunks, maxc_pad)
        return pl.pallas_call(
            _make_sweep_kernel(chunk),
            grid=grid,
            in_specs=in_specs,
            out_specs=[out_spec, out_spec],
            out_shape=[
                jax.ShapeDtypeStruct((g * RAY_SUB, LANES), jnp.float32),
                jax.ShapeDtypeStruct((g * RAY_SUB, LANES), jnp.int32)],
        )(cand, tnear, count, *rays_g, *box, scene.walk_tris)

    if n_groups == 1:
        best_t, best_id = one_group([p[0] for p in rays])
    else:
        best_t, best_id = jax.lax.map(
            lambda planes: one_group(list(planes)), tuple(rays))
    best_t = best_t.reshape(-1)[:r]
    best_id = best_id.reshape(-1)[:r]
    # undo the coherence sort
    return (jnp.zeros_like(best_t).at[perm].set(best_t),
            jnp.zeros_like(best_id).at[perm].set(best_id))


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
    r0 = o.shape[0]
    perm = _coherence_perm(scene, o, d)
    o, d = o[perm], d[perm]
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (r0,))[perm]
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r0,))[perm]
    box, n_chunks, chunk = _chunk_boxes(scene)
    rays, r, g, n_groups = _prep_rays(o, d, tmin, tmax, n_chunks, chunk)

    def one_group(rays_g):
        cand, tnear, count, maxc_pad = _candidates(scene, rays_g, g)
        grid, in_specs, out_spec = _sweep_specs(g, n_chunks, maxc_pad)
        return pl.pallas_call(
            _make_any_sweep_kernel(chunk),
            grid=grid,
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((g * RAY_SUB, LANES), jnp.int32),
        )(cand, tnear, count, *rays_g, *box, scene.walk_tris)

    if n_groups == 1:
        blocked = one_group([p[0] for p in rays])
    else:
        blocked = jax.lax.map(lambda planes: one_group(list(planes)),
                              tuple(rays))
    blocked = blocked.reshape(-1)[:r]
    return jnp.zeros_like(blocked).at[perm].set(blocked) > 0
