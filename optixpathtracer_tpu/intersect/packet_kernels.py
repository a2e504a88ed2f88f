"""Packet-sweep Pallas TPU intersection: per-8-ray candidate lists.

The round-3 walk kernel (intersect/walk_kernels.py) established that block
aggregation is the architectural limit of wavefront traversal on TPU: a
1024-ray block sweeps the UNION of its rays' candidate chunks, ~1000x the
triangle tests of per-ray RT-core descent (`devicePrograms.cu:248`
optixTrace). This kernel attacks the union on two axes:

  * **Role flip.** A VPU op is [8 sublanes, 128 lanes]. The walk kernel
    maps sublanes x lanes to 1024 RAYS and broadcasts one triangle per
    op, so every ray pays for every candidate in the block union. Here
    sublanes = the 8 rays of ONE PACKET and lanes = 128 TRIANGLES of one
    subchunk: a single op tests one packet against 128 triangles at full
    utilization, and each packet sweeps only ITS OWN candidates.
  * **Finer culling grain.** Candidates are 128-triangle SUBCHUNKS
    (scene/flatten.py walk_sub_box), not the 128..1024-tri DMA chunks -
    at 1M tris the chunk grain alone leaves ~20 x 512 tri tests per
    packet; the subchunk grain cuts the swept triangles ~4x further.

Pipeline (reusing the walk kernel's front half):

  1. Block-level chunk-BVH traversal (walk_kernels._candidates): per
     1024-ray block, the candidate chunk union sorted front-to-back. This
     amortizes the scalar-core BVH walk over 1024 rays (a per-packet walk
     would be 128x more scalar work).
  2. Between kernels (plain jnp): EXACT per-ray slab tests against every
     union SUBCHUNK AABB, OR-reduced over each packet's 8 rays and
     bit-packed (_packet_words) into per-packet subchunk MASKS over the
     sorted union - the sweep kernel skims the mask words and visits only
     set bits, in sorted-union order. (Round 4 used a conservative 8-ray
     interval test here; on incoherent wavefronts it passed nearly
     everything - see _packet_words.) Union chunks past the DMA ring
     capacity (j >= cap) are swept unconditionally (correct, rare).
  3. Sweep kernel, grid = (ray blocks,): per block the union chunks are
     DMA'd HBM->VMEM once (shared by all 128 packets), the packet lists
     land in SMEM, and a fori loop over the 128 packets sweeps each
     packet's own subchunk list with front-to-back early exit on the
     packet's best-t. Ray components for packet l are extracted from the
     resident [8, 128] ray planes with a one-hot selector matmul on the
     MXU (R_all[128,128] @ E_l broadcasts column l across lanes;
     precision HIGHEST keeps the extraction exact - Mosaic has no
     dynamic lane indexing, the MXU is the TPU-native way to move one).

Outputs match the other engines: (t, tri_id) only; barycentrics/backface
recomputed differentiably by api._refine.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .types import Hit
from .pallas_kernels import LANES, BIG, _safe_inv
from .walk_kernels import (_candidates, _chunk_boxes, _check_walkable,
                           _coherence_perm, _group_size)

EPS_DET = 1e-12
PACKET = 8            # rays per packet = sublane count
_N_RAY = 11           # ox oy oz dx dy dz inv_dx inv_dy inv_dz tmin tmax
_RAY_PAD = 16         # ray planes padded to 16 so the stacked matmul
                      # operand is [16*8=128, 128]
_UNION_BYTES = 4 * 1024 * 1024  # VMEM granted to the resident union chunks


def _union_cap(chunk: int, maxc_pad: int) -> int:
    cap = max(32, _UNION_BYTES // (16 * chunk * 4))
    return min(cap, maxc_pad)


# ---------------------------------------------------------------------------
# Sweep kernels
# ---------------------------------------------------------------------------

def _extract_packet_rays(rall_ref, l):
    """[16*PACKET, 128] stacked ray planes -> per-plane [PACKET, 128] tiles
    holding column l broadcast across lanes (MXU one-hot selector)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    e = (lane == l).astype(jnp.float32)
    cols = jax.lax.dot_general(
        rall_ref[:], e, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)       # [128, 128]
    return [cols[c * PACKET:(c + 1) * PACKET, :] for c in range(_N_RAY)]


def _mt_packet(rays, tri_ref, base_lane, cid_base, bt, bi):
    """MT of one packet (rays: list of [8,128] lane-broadcast components)
    against 128 triangles (rows of tri_ref [16, chunk], lane slice at
    base_lane). Returns updated (bt, bi) [8,128] running best per
    (ray, lane-slot); ids tie-break to the lowest (inclusive bound, cf.
    walk_kernels._mt_smem_tri)."""
    ox, oy, oz, dx, dy, dz = rays[0], rays[1], rays[2], rays[3], rays[4], \
        rays[5]
    tmin, tmax = rays[9], rays[10]

    def row(c):
        # base_lane = k * 128 (dynamic but provably lane-aligned)
        return tri_ref[c, pl.ds(base_lane, LANES)][None, :]

    v0x, v0y, v0z = row(0), row(1), row(2)
    e1x, e1y, e1z = row(3), row(4), row(5)
    e2x, e2y, e2z = row(6), row(7), row(8)

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
    cid = cid_base + jax.lax.broadcasted_iota(jnp.int32, (PACKET, LANES), 1)
    better = hit & ((t < bt) | ((t == bt) & (cid < bi)))
    return jnp.where(better, t, bt), jnp.where(better, cid, bi)


def _mt_any_packet(rays, tri_ref, base_lane):
    """Occlusion variant: [8, 1]-reducible any-hit of the packet against
    128 triangles."""
    ox, oy, oz, dx, dy, dz = rays[0], rays[1], rays[2], rays[3], rays[4], \
        rays[5]
    tmin, tmax = rays[9], rays[10]

    def row(c):
        return tri_ref[c, pl.ds(base_lane, LANES)][None, :]

    v0x, v0y, v0z = row(0), row(1), row(2)
    e1x, e1y, e1z = row(3), row(4), row(5)
    e2x, e2y, e2z = row(6), row(7), row(8)
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
           & (t > tmin) & (t < tmax))
    return jnp.max(hit.astype(jnp.int32), axis=1, keepdims=True)


def _setup_dmas(cand_ref, list_hbm, hbm_tris, blk, n, cap, union_scr,
                list_scr, union_sem, list_sem):
    """Issue + drain the per-block DMAs: union chunks HBM->VMEM, packet
    mask words HBM->SMEM. One shared semaphore per chain (DMA semaphores
    are a scarce physical resource - a (cap,) array of them deadlocks the
    chip)."""
    def issue(j, _):
        pltpu.make_async_copy(hbm_tris.at[cand_ref[blk, j]],
                              union_scr.at[j], union_sem).start()
        return 0
    jax.lax.fori_loop(0, jnp.minimum(n, cap), issue, 0)
    pltpu.make_async_copy(list_hbm.at[blk], list_scr, list_sem).start()

    def drain(j, _):
        pltpu.make_async_copy(hbm_tris.at[cand_ref[blk, j]],
                              union_scr.at[j], union_sem).wait()
        return 0
    jax.lax.fori_loop(0, jnp.minimum(n, cap), drain, 0)
    pltpu.make_async_copy(list_hbm.at[blk], list_scr, list_sem).wait()


def _make_packet_closest_kernel(chunk: int, cap: int, maxc_pad: int,
                                words_n: int):
    n_sub = chunk // LANES

    def kernel(cand_ref, tnear_ref, count_ref, w0_ref, w1_ref, words_hbm,
               rall_ref, hbm_tris, best_t, best_id, bt_s, bi_s, union_scr,
               mask_scr, ring_scr, union_sem, mask_sem, ring_sem):
        blk = pl.program_id(0)
        n = count_ref[blk, 0]
        _setup_dmas(cand_ref, words_hbm, hbm_tris, blk, n, cap, union_scr,
                    mask_scr, union_sem, mask_sem)
        best_t[:] = jnp.full_like(best_t[:], BIG)
        best_id[:] = jnp.full_like(best_id[:], -1)

        def packet_body(l, _):
            rays = _extract_packet_rays(rall_ref, l)
            tmax = rays[10]
            bt_s[:] = jnp.full_like(bt_s[:], BIG)
            bi_s[:] = jnp.full_like(bi_s[:], -1)
            w0 = w0_ref[blk, l]
            w1 = w1_ref[blk, l]

            def sweep_sub(rays, s):
                j = s // n_sub
                k = s - j * n_sub

                @pl.when(j < cap)
                def _from_union():
                    bt, bi = _mt_packet(
                        rays, union_scr.at[jnp.minimum(j, cap - 1)],
                        k * LANES,
                        cand_ref[blk, j] * chunk + k * LANES,
                        bt_s[:], bi_s[:])
                    bt_s[:] = bt
                    bi_s[:] = bi

                @pl.when(j >= cap)
                def _from_ring():
                    slot = jax.lax.rem(s, 2)
                    dma = pltpu.make_async_copy(
                        hbm_tris.at[cand_ref[blk, j]], ring_scr.at[slot],
                        ring_sem)
                    dma.start()
                    dma.wait()
                    bt, bi = _mt_packet(
                        rays, ring_scr.at[slot], k * LANES,
                        cand_ref[blk, j] * chunk + k * LANES,
                        bt_s[:], bi_s[:])
                    bt_s[:] = bt
                    bi_s[:] = bi

            def cond(state):
                w, cont = state
                return cont

            def body(state):
                w, _ = state
                word0 = mask_scr[l, w]

                # iterate set bits only: lowest-set-bit + branch-free
                # binary position ladder (scalar core has no ctz/bitcast)
                def bcond(st):
                    return st != 0

                def bbody(word):
                    b = word & (-word)
                    k = (jnp.where((b & jnp.int32(-65536)) != 0, 16, 0)
                         + jnp.where((b & jnp.int32(-16711936)) != 0, 8, 0)
                         + jnp.where((b & jnp.int32(-252645136)) != 0, 4, 0)
                         + jnp.where((b & jnp.int32(-858993460)) != 0, 2, 0)
                         + jnp.where((b & jnp.int32(-1431655766)) != 0, 1,
                                     0))
                    sweep_sub(rays, w * 32 + k)
                    return word ^ b

                jax.lax.while_loop(bcond, bbody, word0)

                # word-granular front-to-back early exit on the packet's
                # worst ray: candidates ascend in tnear with j
                per_ray = jnp.min(jnp.minimum(bt_s[:], tmax), axis=1,
                                  keepdims=True)
                limit = jnp.max(per_ray)
                j0_next = jnp.minimum(((w + 1) * 32) // n_sub,
                                      maxc_pad - 1)
                cont = (w + 1 <= w1) & (tnear_ref[blk, j0_next] <= limit)
                return w + 1, cont

            jax.lax.while_loop(cond, body, (w0, w0 <= w1))

            # lane-slot reduce -> per-ray best, write this packet's column
            bt, bi = bt_s[:], bi_s[:]
            m = jnp.min(bt, axis=1, keepdims=True)
            sel = jnp.min(jnp.where(bt == m, bi, jnp.int32(2**31 - 1)),
                          axis=1, keepdims=True)
            sel = jnp.where(m < BIG, sel, -1)
            lane = jax.lax.broadcasted_iota(jnp.int32, (PACKET, LANES), 1)
            best_t[:] = jnp.where(lane == l, jnp.broadcast_to(m, bt.shape),
                                  best_t[:])
            best_id[:] = jnp.where(lane == l,
                                   jnp.broadcast_to(sel, bi.shape),
                                   best_id[:])
            return 0

        jax.lax.fori_loop(0, LANES, packet_body, 0)

    return kernel


def _make_packet_any_kernel(chunk: int, cap: int, maxc_pad: int,
                            words_n: int):
    n_sub = chunk // LANES

    def kernel(cand_ref, tnear_ref, count_ref, w0_ref, w1_ref, words_hbm,
               rall_ref, hbm_tris, blocked, blk_s, union_scr, mask_scr,
               ring_scr, union_sem, mask_sem, ring_sem):
        blk = pl.program_id(0)
        n = count_ref[blk, 0]
        _setup_dmas(cand_ref, words_hbm, hbm_tris, blk, n, cap, union_scr,
                    mask_scr, union_sem, mask_sem)
        blocked[:] = jnp.zeros_like(blocked[:])

        def packet_body(l, _):
            rays = _extract_packet_rays(rall_ref, l)
            blk_s[:] = jnp.zeros_like(blk_s[:])
            w0 = w0_ref[blk, l]
            w1 = w1_ref[blk, l]

            def sweep_sub(s):
                j = s // n_sub
                k = s - j * n_sub

                @pl.when(j < cap)
                def _from_union():
                    blk_s[:] = jnp.maximum(blk_s[:], _mt_any_packet(
                        rays, union_scr.at[jnp.minimum(j, cap - 1)],
                        k * LANES))

                @pl.when(j >= cap)
                def _from_ring():
                    slot = jax.lax.rem(s, 2)
                    dma = pltpu.make_async_copy(
                        hbm_tris.at[cand_ref[blk, j]], ring_scr.at[slot],
                        ring_sem)
                    dma.start()
                    dma.wait()
                    blk_s[:] = jnp.maximum(blk_s[:], _mt_any_packet(
                        rays, ring_scr.at[slot], k * LANES))

            def cond(state):
                w, cont = state
                return cont

            def body(state):
                w, _ = state
                word0 = mask_scr[l, w]
                not_done = jnp.min(blk_s[:]) == 0

                def bcond(st):
                    return st != 0

                def bbody(word):
                    b = word & (-word)
                    k = (jnp.where((b & jnp.int32(-65536)) != 0, 16, 0)
                         + jnp.where((b & jnp.int32(-16711936)) != 0, 8, 0)
                         + jnp.where((b & jnp.int32(-252645136)) != 0, 4, 0)
                         + jnp.where((b & jnp.int32(-858993460)) != 0, 2, 0)
                         + jnp.where((b & jnp.int32(-1431655766)) != 0, 1,
                                     0))
                    sweep_sub(w * 32 + k)
                    return word ^ b

                jax.lax.while_loop(bcond, bbody,
                                   jnp.where(not_done, word0, 0))

                all_blocked = jnp.min(blk_s[:]) > 0
                cont = (w + 1 <= w1) & (~all_blocked)
                return w + 1, cont

            jax.lax.while_loop(cond, body, (w0, w0 <= w1))

            lane = jax.lax.broadcasted_iota(jnp.int32, (PACKET, LANES), 1)
            blocked[:] = jnp.where(lane == l, blk_s[:], blocked[:])
            return 0

        jax.lax.fori_loop(0, LANES, packet_body, 0)

    return kernel


# ---------------------------------------------------------------------------
# Host wrappers
# ---------------------------------------------------------------------------

def _prep_rays_packet(o, d, tmin, tmax, n_chunks, chunk):
    """Two ray layouts from one padded wavefront:

      * traversal planes [g*8, 128] row-major (ray = row*128 + lane), the
        layout walk_kernels' traversal kernel expects;
      * sweep planes stacked [n_groups, g, 16*8, 128] packet-major
        (ray = lane*8 + sublane), so one [128, 128] selector matmul
        extracts a whole packet.
    """
    r = o.shape[0]
    block = PACKET * LANES
    n_blocks = pl.cdiv(r, block)
    g = _group_size(n_blocks, n_chunks, chunk)
    n_groups = pl.cdiv(n_blocks, g)
    r_pad = n_groups * g * block
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (r,))
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))

    planes = []
    for k in range(3):
        planes.append((o[:, k], 0.0))
    for k in range(3):
        planes.append((d[:, k], 1.0))
    for k in range(3):
        planes.append((_safe_inv(d[:, k]), 1.0))
    planes.append((tmin, 0.0))
    planes.append((tmax, -1.0))  # padding rays: no hits

    trav, sweep = [], []
    for x, fill in planes:
        pad = r_pad - r
        if pad:
            x = jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])
        trav.append(x.reshape(n_groups, g * PACKET, LANES))
        # packet-major: [B, 128, 8] -> [B, 8, 128] with [s, l] = ray l*8+s
        sweep.append(x.reshape(n_groups * g, LANES, PACKET)
                     .transpose(0, 2, 1))
    zeros = jnp.zeros_like(sweep[0])
    rall = jnp.concatenate(sweep + [zeros] * (_RAY_PAD - _N_RAY), axis=1)
    rall = rall.reshape(n_groups, g, _RAY_PAD * PACKET, LANES)
    return trav, rall, r, g, n_groups


_MASK_TILE = 512  # subchunks per exact-mask tile (bounds the [g,8,128,T]
                  # broadcast intermediates to tens of MB)


def _packet_words(scene, rall_g, cand, tnear, g, maxc_pad):
    """Per-packet candidate bit masks at SUBCHUNK grain (jnp, between the
    kernels): EXACT per-ray slab tests against every union subchunk AABB
    (walk_sub_box), OR-reduced over the 8 rays of each packet and
    bit-packed 32/int32 word in sorted-union order (s = j * n_sub + k).

    Round 5 change: the round-4 version used a conservative interval test
    of the packet's 8-ray bounds, which on incoherent bounce wavefronts
    (8 near-random directions) degenerates to 'pass everything' - measured
    hall bounce blocks swept 312 of 1322 chunks vs a per-ray exact need
    of 6.4 (benchmarks/hall_stats.py). Exact tests cost ~25 VPU flops per
    (ray, subchunk) - a few ms - and collapse the sweep to near the
    packet-exact floor.

    Returns (words int32 [g, 128, words_n], w0, w1 int32 [g, 128] =
    first/last nonzero word per packet, so the kernel's word loop skips
    empty spans)."""
    chunk = scene.walk_tris.shape[2]
    n_sub = chunk // LANES
    rall = rall_g.reshape(g, _RAY_PAD, PACKET, LANES)
    o = rall[:, 0:3]          # [g, 3, 8, 128]
    inv = rall[:, 6:9]
    tmin = rall[:, 9]          # [g, 8, 128]
    tmax = rall[:, 10]
    valid = tmax >= 0.0

    # subchunk AABBs in sorted-union order: sub id = cand * n_sub + k
    c = scene.walk_tris.shape[0]
    sub_ids = (jnp.clip(cand, 0, c - 1)[:, :, None] * n_sub
               + jnp.arange(n_sub)[None, None, :]).reshape(g, -1)
    sb = scene.walk_sub_box                      # [6, C * n_sub]
    bn = jnp.stack([sb[row][sub_ids] for row in range(3)], 1)  # [g, 3, S]
    bx = jnp.stack([sb[row + 3][sub_ids] for row in range(3)], 1)
    pad_cand = jnp.repeat(tnear >= BIG, n_sub, axis=1)  # [g, S]

    s_total = maxc_pad * n_sub
    w_real = s_total // 32
    words_n = pl.cdiv(max(LANES, w_real), LANES) * LANES  # lane-aligned
    tile = min(_MASK_TILE, s_total)
    s_pad = pl.cdiv(s_total, tile) * tile
    if s_pad != s_total:
        padw = s_pad - s_total
        bn = jnp.pad(bn, ((0, 0), (0, 0), (0, padw)))
        bx = jnp.pad(bx, ((0, 0), (0, 0), (0, padw)))
        pad_cand = jnp.pad(pad_cand, ((0, 0), (0, padw)),
                           constant_values=True)
    shifts = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))

    def one_tile(s0):
        bn_t = jax.lax.dynamic_slice_in_dim(bn, s0, tile, 2)
        bx_t = jax.lax.dynamic_slice_in_dim(bx, s0, tile, 2)
        pc_t = jax.lax.dynamic_slice_in_dim(pad_cand, s0, tile, 1)
        t_near = jnp.full((g, PACKET, LANES, tile), -BIG, jnp.float32)
        t_far = jnp.full((g, PACKET, LANES, tile), BIG, jnp.float32)
        for ax in range(3):
            oo = o[:, ax][..., None]        # [g, 8, 128, 1]
            ii = inv[:, ax][..., None]
            b0 = bn_t[:, ax][:, None, None, :]   # [g, 1, 1, T]
            b1 = bx_t[:, ax][:, None, None, :]
            p0 = (b0 - oo) * ii
            p1 = (b1 - oo) * ii
            t_near = jnp.maximum(t_near, jnp.minimum(p0, p1))
            t_far = jnp.minimum(t_far, jnp.maximum(p0, p1))
        ok = ((t_near <= t_far) & (t_far >= tmin[..., None])
              & (t_near <= tmax[..., None]) & valid[..., None]
              & ~pc_t[:, None, None, :])
        ok = jnp.any(ok, axis=1)            # OR over the packet's 8 rays
        bits = ok.reshape(g, LANES, tile // 32, 32).astype(jnp.uint32)
        return jnp.sum(bits * shifts, axis=3, dtype=jnp.uint32)

    if s_pad == tile:
        words = one_tile(0)
    else:
        tiles = jax.lax.map(one_tile,
                            jnp.arange(0, s_pad, tile, dtype=jnp.int32))
        words = jnp.moveaxis(tiles, 0, 2).reshape(g, LANES, s_pad // 32)
    words = words[:, :, :w_real]
    if w_real < words_n:
        words = jnp.pad(words, ((0, 0), (0, 0), (0, words_n - w_real)))
    nz = words != 0
    any_nz = jnp.any(nz, axis=2)
    w0 = jnp.where(any_nz, jnp.argmax(nz, axis=2), 1).astype(jnp.int32)
    w1 = jnp.where(any_nz,
                   words_n - 1 - jnp.argmax(nz[:, :, ::-1], axis=2),
                   0).astype(jnp.int32)
    return words.astype(jnp.int32), w0, w1


def _sweep_call(scene, cand, tnear, count, words, w0, w1, rall_g, g,
                maxc_pad, make_kernel, out_dtypes):
    chunk = scene.walk_tris.shape[2]
    cap = _union_cap(chunk, maxc_pad)
    words_n = words.shape[2]

    cand_spec = pl.BlockSpec((g, maxc_pad), lambda b: (0, 0),
                             memory_space=pltpu.SMEM)
    count_spec = pl.BlockSpec((g, LANES), lambda b: (0, 0),
                              memory_space=pltpu.SMEM)
    words_spec = pl.BlockSpec(memory_space=pl.ANY)
    rall_spec = pl.BlockSpec((1, _RAY_PAD * PACKET, LANES),
                             lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec(memory_space=pl.ANY)
    out_spec = pl.BlockSpec((PACKET, LANES), lambda b: (b, 0),
                            memory_space=pltpu.VMEM)

    kernel = make_kernel(chunk, cap, maxc_pad, words_n)

    def wrapped(cand, tnear, count, w0, w1, words, rall, tris, *rest):
        return kernel(cand, tnear, count, w0, w1, words,
                      rall.at[0], tris, *rest)

    if len(out_dtypes) == 2:  # closest: (bt, bi) running state
        state = [pltpu.VMEM((PACKET, LANES), jnp.float32),
                 pltpu.VMEM((PACKET, LANES), jnp.int32)]
    else:                     # any: blocked state
        state = [pltpu.VMEM((PACKET, LANES), jnp.int32)]
    scratch = state + [
        pltpu.VMEM((cap, 16, chunk), jnp.float32),    # union chunks
        pltpu.SMEM((LANES, words_n), jnp.int32),      # packet mask words
        pltpu.VMEM((2, 16, chunk), jnp.float32),      # overflow ring
        pltpu.SemaphoreType.DMA,   # shared by the union prefetch chain
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
    ]
    out_shapes = [jax.ShapeDtypeStruct((g * PACKET, LANES), dt)
                  for dt in out_dtypes]
    out_specs = [out_spec] * len(out_dtypes)
    if len(out_dtypes) == 1:
        out_shapes, out_specs = out_shapes[0], out_specs[0]
    return pl.pallas_call(
        wrapped,
        grid=(g,),
        in_specs=[cand_spec, cand_spec, count_spec, count_spec, count_spec,
                  words_spec, rall_spec, tri_spec],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
    )(cand, tnear, count, w0, w1, words, rall_g, scene.walk_tris)


def _unpack_ray_major(x, r):
    """[g*8, 128] sweep-layout output -> flat [r] (ray = lane*8 + sub)."""
    nb = x.shape[0] // PACKET
    return (x.reshape(nb, PACKET, LANES).transpose(0, 2, 1)
            .reshape(-1)[:r])


@jax.jit
def intersect_closest_raw(scene, o, d, tmin=0.0, tmax=100.0):
    """Packet-sweep closest hit: (t, tri_id) per ray (t = BIG on miss)."""
    _check_walkable(scene)
    r0 = o.shape[0]
    perm = _coherence_perm(scene, o, d)
    o, d = o[perm], d[perm]
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (r0,))[perm]
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r0,))[perm]
    _, n_chunks, chunk = _chunk_boxes(scene)
    trav, rall, r, g, n_groups = _prep_rays_packet(
        o, d, tmin, tmax, n_chunks, chunk)

    def one_group(args):
        trav_g, rall_g = args
        cand, tnear, count, maxc_pad = _candidates(scene, list(trav_g), g)
        words, w0, w1 = _packet_words(scene, rall_g, cand, tnear, g,
                                      maxc_pad)
        return _sweep_call(scene, cand, tnear, count, words, w0, w1,
                           rall_g, g, maxc_pad,
                           _make_packet_closest_kernel,
                           (jnp.float32, jnp.int32))

    if n_groups == 1:
        best_t, best_id = one_group(([p[0] for p in trav], rall[0]))
    else:
        best_t, best_id = jax.lax.map(
            lambda a: one_group((list(a[0]), a[1])), (tuple(trav), rall))
        best_t = best_t.reshape(-1, LANES)
        best_id = best_id.reshape(-1, LANES)
    best_t = _unpack_ray_major(best_t, r)
    best_id = _unpack_ray_major(best_id, r)
    return (jnp.zeros_like(best_t).at[perm].set(best_t),
            jnp.zeros_like(best_id).at[perm].set(best_id))


def intersect_closest(scene, o, d, tmin=0.0, tmax=100.0):
    """Hit-record wrapper matching the engine interface."""
    best_t, best_id = intersect_closest_raw(scene, o, d, tmin, tmax)
    n_real = scene.tri_valid.shape[0]
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
    """Packet-sweep occlusion query."""
    _check_walkable(scene)
    r0 = o.shape[0]
    perm = _coherence_perm(scene, o, d)
    o, d = o[perm], d[perm]
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (r0,))[perm]
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r0,))[perm]
    _, n_chunks, chunk = _chunk_boxes(scene)
    trav, rall, r, g, n_groups = _prep_rays_packet(
        o, d, tmin, tmax, n_chunks, chunk)

    def one_group(args):
        trav_g, rall_g = args
        cand, tnear, count, maxc_pad = _candidates(scene, list(trav_g), g)
        words, w0, w1 = _packet_words(scene, rall_g, cand, tnear, g,
                                      maxc_pad)
        return _sweep_call(scene, cand, tnear, count, words, w0, w1,
                           rall_g, g, maxc_pad, _make_packet_any_kernel,
                           (jnp.int32,))

    if n_groups == 1:
        blocked = one_group(([p[0] for p in trav], rall[0]))
    else:
        blocked = jax.lax.map(
            lambda a: one_group((list(a[0]), a[1])), (tuple(trav), rall))
        blocked = blocked.reshape(-1, LANES)
    return (jnp.zeros_like(_unpack_ray_major(blocked, r))
            .at[perm].set(_unpack_ray_major(blocked, r))) > 0
