"""Packet-sweep Pallas TPU intersection: per-8-ray candidate lists.

The round-3 walk kernel (intersect/walk_kernels.py) established that block
aggregation is the architectural limit of wavefront traversal on TPU: a
1024-ray block sweeps the UNION of its rays' candidate chunks, ~1000x the
triangle tests of per-ray RT-core descent (`devicePrograms.cu:248`
optixTrace). This kernel attacks the union directly by flipping the VPU
tile's roles:

  * A VPU op is [8 sublanes, 128 lanes]. The walk kernel uses sublanes x
    lanes = 1024 RAYS and broadcasts one triangle per op; every ray pays
    for every candidate in the block union.
  * Here, sublanes = the 8 rays of ONE PACKET and lanes = 128 TRIANGLES of
    one chunk slice: a single op tests one packet against a whole chunk
    slice at full utilization - and each packet sweeps only ITS OWN
    candidate list. 8-ray packets of coherence-sorted rays have candidate
    sets close to per-ray BVH descent, so the union amplification drops
    from 1024-ray to 8-ray granularity.

Pipeline (reusing the walk kernel's front half):

  1. Block-level chunk-BVH traversal (walk_kernels._candidates): per
     1024-ray block, the candidate chunk union sorted front-to-back. This
     amortizes the scalar-core BVH walk over 1024 rays (a per-packet walk
     would be 128x more scalar work).
  2. Between kernels (plain jnp): per-packet conservative interval slab
     tests against each union candidate's AABB -> a BIT MASK per packet
     over the block's sorted candidate list, packed 32/int32 word.
  3. Sweep kernel, grid = (block, packet): at packet 0 of each block the
     union candidates' triangles are DMA'd HBM->VMEM once (they are shared
     by all 128 packets - per-packet DMA would re-fetch everything 128x);
     each packet then walks its mask bits over the sorted candidates,
     early-exits on t_near > its own best-t, and MT-tests only its own
     candidates. Ray components for packet l are extracted from the
     resident [8, 128] ray planes with a one-hot selector matmul on the
     MXU (R_all[96,128] @ E_l[128,128] broadcasts column l across lanes;
     precision HIGHEST keeps the extraction exact - Mosaic has no dynamic
     lane indexing, the MXU is the TPU-native way to move a lane).

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
        return tri_ref[c, base_lane:base_lane + LANES][None, :]

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


def _make_packet_closest_kernel(chunk: int, cap: int, w32: int,
                                maxc_pad: int):
    n_sub = chunk // LANES

    def kernel(cand_ref, tnear_ref, count_ref, mask_hbm, rall_ref, hbm_tris,
               best_t, best_id, bt_s, bi_s, union_scr, mask_scr, ring_scr,
               union_sems, mask_sem, ring_sems):
        blk = pl.program_id(0)
        l = pl.program_id(1)
        n = count_ref[blk, 0]

        @pl.when(l == 0)
        def _block_setup():
            # fetch the union chunks once per block; every packet reads them
            def issue(j, _):
                pltpu.make_async_copy(
                    hbm_tris.at[cand_ref[blk, j]], union_scr.at[j],
                    union_sems.at[j]).start()
                return 0
            jax.lax.fori_loop(0, jnp.minimum(n, cap), issue, 0)
            # per-packet candidate masks for the whole block
            pltpu.make_async_copy(mask_hbm.at[blk], mask_scr,
                                  mask_sem).start()

            def drain(j, _):
                pltpu.make_async_copy(
                    hbm_tris.at[cand_ref[blk, j]], union_scr.at[j],
                    union_sems.at[j]).wait()
                return 0
            jax.lax.fori_loop(0, jnp.minimum(n, cap), drain, 0)
            pltpu.make_async_copy(mask_hbm.at[blk], mask_scr,
                                  mask_sem).wait()
            best_t[:] = jnp.full_like(best_t[:], BIG)
            best_id[:] = jnp.full_like(best_id[:], -1)

        rays = _extract_packet_rays(rall_ref, l)
        tmax = rays[10]

        # per-packet running best lives in VMEM scratch (vector state can't
        # ride lax.cond/while carries through Mosaic's scf lowering)
        bt_s[:] = jnp.full_like(bt_s[:], BIG)
        bi_s[:] = jnp.full_like(bi_s[:], -1)

        def sweep(tri_ref, c):
            cid_base = c * chunk
            bt, bi = bt_s[:], bi_s[:]
            for k in range(n_sub):
                bt, bi = _mt_packet(rays, tri_ref, k * LANES,
                                    cid_base + k * LANES, bt, bi)
            bt_s[:] = bt
            bi_s[:] = bi

        def cond(state):
            j, cont = state
            return cont

        def body(state):
            j, _ = state
            word = mask_scr[l, j // 32]
            mine = ((word >> jax.lax.rem(j, 32)) & 1) > 0
            c = cand_ref[blk, j]

            # overflow candidates (j >= cap) are fetched on demand into a
            # 2-slot ring; the resident-union fast path covers j < cap
            @pl.when(mine & (j >= cap))
            def _ring_path():
                slot = jax.lax.rem(j, 2)
                dma = pltpu.make_async_copy(hbm_tris.at[c],
                                            ring_scr.at[slot],
                                            ring_sems.at[slot])
                dma.start()
                dma.wait()
                sweep(ring_scr.at[slot], c)

            @pl.when(mine & (j < cap))
            def _union_path():
                sweep(union_scr.at[jnp.minimum(j, cap - 1)], c)

            # early exit: candidates are tnear-sorted; stop once the next
            # can't beat this packet's worst ray
            per_ray = jnp.min(jnp.minimum(bt_s[:], tmax), axis=1,
                              keepdims=True)
            limit = jnp.max(per_ray)
            nxt = jnp.minimum(j + 1, maxc_pad - 1)
            cont = (j + 1 < n) & (tnear_ref[blk, nxt] <= limit)
            return j + 1, cont

        jax.lax.while_loop(cond, body, (jnp.int32(0), n > 0))

        # reduce lane-slots -> per-ray best (min t, lowest id on ties),
        # then write this packet's column of the block's [8, 128] output
        bt, bi = bt_s[:], bi_s[:]
        m = jnp.min(bt, axis=1, keepdims=True)                # [8, 1]
        sel_id = jnp.min(jnp.where(bt == m, bi, jnp.int32(2**31 - 1)),
                         axis=1, keepdims=True)
        sel_id = jnp.where(m < BIG, sel_id, -1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (PACKET, LANES), 1)
        best_t[:] = jnp.where(lane == l, jnp.broadcast_to(m, bt.shape),
                              best_t[:])
        best_id[:] = jnp.where(lane == l,
                               jnp.broadcast_to(sel_id, bi.shape),
                               best_id[:])

    return kernel


def _make_packet_any_kernel(chunk: int, cap: int, w32: int, maxc_pad: int):
    n_sub = chunk // LANES

    def kernel(cand_ref, tnear_ref, count_ref, mask_hbm, rall_ref, hbm_tris,
               blocked, blk_s, union_scr, mask_scr, ring_scr, union_sems,
               mask_sem, ring_sems):
        blk = pl.program_id(0)
        l = pl.program_id(1)
        n = count_ref[blk, 0]

        @pl.when(l == 0)
        def _block_setup():
            def issue(j, _):
                pltpu.make_async_copy(
                    hbm_tris.at[cand_ref[blk, j]], union_scr.at[j],
                    union_sems.at[j]).start()
                return 0
            jax.lax.fori_loop(0, jnp.minimum(n, cap), issue, 0)
            pltpu.make_async_copy(mask_hbm.at[blk], mask_scr,
                                  mask_sem).start()

            def drain(j, _):
                pltpu.make_async_copy(
                    hbm_tris.at[cand_ref[blk, j]], union_scr.at[j],
                    union_sems.at[j]).wait()
                return 0
            jax.lax.fori_loop(0, jnp.minimum(n, cap), drain, 0)
            pltpu.make_async_copy(mask_hbm.at[blk], mask_scr,
                                  mask_sem).wait()
            blocked[:] = jnp.zeros_like(blocked[:])

        rays = _extract_packet_rays(rall_ref, l)
        tmin, tmax = rays[9], rays[10]
        blk_s[:] = jnp.zeros_like(blk_s[:])

        def hit_any(tri_ref):
            acc = blk_s[:]
            for k in range(n_sub):
                def row(comp):
                    return tri_ref[comp, k * LANES:k * LANES + LANES][None, :]
                v0x, v0y, v0z = row(0), row(1), row(2)
                e1x, e1y, e1z = row(3), row(4), row(5)
                e2x, e2y, e2z = row(6), row(7), row(8)
                dx, dy, dz = rays[3], rays[4], rays[5]
                ox, oy, oz = rays[0], rays[1], rays[2]
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
                acc = jnp.maximum(acc, jnp.max(hit.astype(jnp.int32),
                                               axis=1, keepdims=True))
            blk_s[:] = acc

        def cond(state):
            j, cont = state
            return cont

        def body(state):
            j, _ = state
            word = mask_scr[l, j // 32]
            mine = ((word >> jax.lax.rem(j, 32)) & 1) > 0
            c = cand_ref[blk, j]

            @pl.when(mine & (j >= cap))
            def _ring_path():
                slot = jax.lax.rem(j, 2)
                dma = pltpu.make_async_copy(hbm_tris.at[c],
                                            ring_scr.at[slot],
                                            ring_sems.at[slot])
                dma.start()
                dma.wait()
                hit_any(ring_scr.at[slot])

            @pl.when(mine & (j < cap))
            def _union_path():
                hit_any(union_scr.at[jnp.minimum(j, cap - 1)])

            all_blocked = jnp.min(blk_s[:]) > 0
            cont = (j + 1 < n) & (~all_blocked)
            return j + 1, cont

        jax.lax.while_loop(cond, body, (jnp.int32(0), n > 0))

        lane = jax.lax.broadcasted_iota(jnp.int32, (PACKET, LANES), 1)
        blocked[:] = jnp.where(lane == l, blk_s[:], blocked[:])

    return kernel


# ---------------------------------------------------------------------------
# Host wrappers
# ---------------------------------------------------------------------------

def _prep_rays_packet(o, d, tmin, tmax, n_chunks, chunk, n_nodes):
    """Two ray layouts from one padded wavefront:

      * traversal planes [g*8, 128] row-major (ray = row*128 + lane), the
        layout walk_kernels' traversal kernel expects;
      * sweep planes [g*16*8, 128] packet-major (ray = lane*8 + sublane),
        16 component rows of 8 sublanes stacked so one [128, 128] selector
        matmul extracts a whole packet.
    """
    r = o.shape[0]
    block = PACKET * LANES
    n_blocks = pl.cdiv(r, block)
    g = _group_size(n_blocks, n_chunks, chunk, n_nodes)
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
    # stack the 11 planes (+5 zero pads) per block: [n_groups, g, 128, 128]
    zeros = jnp.zeros_like(sweep[0])
    rall = jnp.concatenate(sweep + [zeros] * (_RAY_PAD - _N_RAY), axis=1)
    rall = rall.reshape(n_groups, g, _RAY_PAD * PACKET, LANES)
    return trav, rall, r, g, n_groups


def _packet_masks(scene, rall_g, cand, tnear, g, maxc_pad):
    """Per-packet bit masks over the block's sorted candidates (jnp,
    between the kernels): conservative interval slab test of each packet's
    8-ray bounds against each candidate chunk's AABB, bit-packed to
    int32 words. rall_g: [g, 128, 128] stacked sweep planes."""
    rall = rall_g.reshape(g, _RAY_PAD, PACKET, LANES)
    o = rall[:, 0:3]          # [g, 3, 8, 128]
    inv = rall[:, 6:9]
    tmin = rall[:, 9]          # [g, 8, 128]
    tmax = rall[:, 10]
    valid = tmax >= 0.0

    def pmin(x, fill):
        return jnp.min(jnp.where(valid[:, None], x, fill), axis=2)  # [g,3,128]

    def pmax(x, fill):
        return jnp.max(jnp.where(valid[:, None], x, fill), axis=2)

    o_lo, o_hi = pmin(o, BIG), pmax(o, -BIG)
    i_lo, i_hi = pmin(inv, BIG), pmax(inv, -BIG)
    t0_lo = jnp.min(jnp.where(valid, tmin, BIG), axis=1)   # [g, 128]
    t1_hi = jnp.max(jnp.where(valid, tmax, -BIG), axis=1)

    # candidate AABBs in sorted order: [g, maxc, 6]
    link = scene.walk_node_link
    boxn = scene.walk_node_box
    is_leaf = link[2] == 1
    c = scene.walk_tris.shape[0]
    node_of_chunk = jnp.zeros((c,), jnp.int32).at[
        jnp.where(is_leaf, link[1], c)].set(
        jnp.arange(link.shape[1], dtype=jnp.int32), mode="drop")
    nid = node_of_chunk[jnp.clip(cand, 0, c - 1)]          # [g, maxc]
    bn = [boxn[row][nid] for row in range(3)]              # each [g, maxc]
    bx = [boxn[row + 3][nid] for row in range(3)]

    # interval slab test: [g, 128, maxc]
    t_near = jnp.full((g, LANES, maxc_pad), -BIG, jnp.float32)
    t_far = jnp.full((g, LANES, maxc_pad), BIG, jnp.float32)
    for ax in range(3):
        prods = []
        for b in (bn[ax][:, None, :], bx[ax][:, None, :]):
            for oo in (o_lo[:, ax][..., None], o_hi[:, ax][..., None]):
                for ii in (i_lo[:, ax][..., None], i_hi[:, ax][..., None]):
                    prods.append((b - oo) * ii)
        axis_lo = prods[0]
        axis_hi = prods[0]
        for p in prods[1:]:
            axis_lo = jnp.minimum(axis_lo, p)
            axis_hi = jnp.maximum(axis_hi, p)
        t_near = jnp.maximum(t_near, axis_lo)
        t_far = jnp.minimum(t_far, axis_hi)

    ok = ((t_near <= t_far) & (t_far >= t0_lo[..., None])
          & (t_near <= t1_hi[..., None]) & (tnear[:, None, :] < BIG))

    # bit-pack along candidates: [g, 128, maxc/32] int32
    w32 = maxc_pad // 32
    bits = ok.reshape(g, LANES, w32, 32).astype(jnp.uint32)
    shifts = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    words = jnp.sum(bits * shifts, axis=3, dtype=jnp.uint32)
    return words.astype(jnp.int32)


def _sweep_call(scene, cand, tnear, count, mask, rall_g, g, maxc_pad,
                make_kernel, out_dtypes):
    n_chunks = scene.walk_tris.shape[0]
    chunk = scene.walk_tris.shape[2]
    cap = _union_cap(chunk, maxc_pad)
    w32 = maxc_pad // 32

    cand_spec = pl.BlockSpec((g, maxc_pad), lambda b, l: (0, 0),
                             memory_space=pltpu.SMEM)
    count_spec = pl.BlockSpec((g, LANES), lambda b, l: (0, 0),
                              memory_space=pltpu.SMEM)
    mask_spec = pl.BlockSpec(memory_space=pl.ANY)
    rall_spec = pl.BlockSpec((1, _RAY_PAD * PACKET, LANES),
                             lambda b, l: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec(memory_space=pl.ANY)
    out_spec = pl.BlockSpec((PACKET, LANES), lambda b, l: (b, 0),
                            memory_space=pltpu.VMEM)

    kernel = make_kernel(chunk, cap, w32, maxc_pad)

    def wrapped(cand, tnear, count, mask, rall, tris, *outs):
        # rall block arrives [1, 128, 128]; drop the leading dim for the
        # matmul
        return kernel(cand, tnear, count, mask,
                      rall.at[0], tris, *outs)

    if len(out_dtypes) == 2:  # closest: (bt, bi) running state
        state = [pltpu.VMEM((PACKET, LANES), jnp.float32),
                 pltpu.VMEM((PACKET, LANES), jnp.int32)]
    else:                     # any: blocked state
        state = [pltpu.VMEM((PACKET, LANES), jnp.int32)]
    scratch = state + [
        pltpu.VMEM((cap, 16, chunk), jnp.float32),    # union chunks
        pltpu.SMEM((LANES, w32), jnp.int32),          # packet masks
        pltpu.VMEM((2, 16, chunk), jnp.float32),      # overflow ring
        pltpu.SemaphoreType.DMA((cap,)),
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA((2,)),
    ]
    out_shapes = [jax.ShapeDtypeStruct((g * PACKET, LANES), dt)
                  for dt in out_dtypes]
    out_specs = [out_spec] * len(out_dtypes)
    if len(out_dtypes) == 1:
        out_shapes, out_specs = out_shapes[0], out_specs[0]
    return pl.pallas_call(
        wrapped,
        grid=(g, LANES),
        in_specs=[cand_spec, cand_spec, count_spec, mask_spec, rall_spec,
                  tri_spec],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
    )(cand, tnear, count, mask, rall_g, scene.walk_tris)


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
        o, d, tmin, tmax, n_chunks, chunk, scene.walk_node_box.shape[1])

    def one_group(args):
        trav_g, rall_g = args
        cand, tnear, count, maxc_pad = _candidates(scene, list(trav_g), g)
        mask = _packet_masks(scene, rall_g, cand, tnear, g, maxc_pad)
        return _sweep_call(scene, cand, tnear, count, mask, rall_g, g,
                           maxc_pad, _make_packet_closest_kernel,
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
        o, d, tmin, tmax, n_chunks, chunk, scene.walk_node_box.shape[1])

    def one_group(args):
        trav_g, rall_g = args
        cand, tnear, count, maxc_pad = _candidates(scene, list(trav_g), g)
        mask = _packet_masks(scene, rall_g, cand, tnear, g, maxc_pad)
        return _sweep_call(scene, cand, tnear, count, mask, rall_g, g,
                           maxc_pad, _make_packet_any_kernel, (jnp.int32,))

    if n_groups == 1:
        blocked = one_group(([p[0] for p in trav], rall[0]))
    else:
        blocked = jax.lax.map(
            lambda a: one_group((list(a[0]), a[1])), (tuple(trav), rall))
        blocked = blocked.reshape(-1, LANES)
    return (jnp.zeros_like(_unpack_ray_major(blocked, r))
            .at[perm].set(_unpack_ray_major(blocked, r))) > 0
