"""Candidate-tightness diagnostics on the hall flagship (VERDICT r4 item 1).

The walk sweep's cost is (swept candidate chunks per block) x (chunk size)
x ~40 VPU cycles. This script measures, on the real device, for hall
primaries AND a bounce-1-like wavefront:

  * per-BLOCK union candidate counts (what the traversal kernel emits),
  * per-BLOCK counts bounded by the block's max hit-t (what the sorted
    sweep actually processes after early exit),
  * per-RAY exact candidate counts bounded by each ray's own hit-t (the
    floor any per-ray scheme could reach at this chunk grain),

at both the current chunk grain and the 128-tri subchunk grain
(scene.walk_sub_box), plus a traversal-vs-sweep wall-clock split.

Usage: python benchmarks/hall_stats.py [--scene hall] [--res 256]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="hall")
    ap.add_argument("--res", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from optixpathtracer_tpu.scene import flatten_model
    from optixpathtracer_tpu.scene.procedural import PRESETS
    from optixpathtracer_tpu.camera.camera import generate_rays
    from optixpathtracer_tpu.intersect import walk_kernels as wk
    from optixpathtracer_tpu.intersect.api import intersect_closest

    model, cam, lights = PRESETS[args.scene]()
    scene = flatten_model(model, lights)
    C = scene.walk_tris.shape[0]
    chunk = scene.walk_tris.shape[2]
    print(f"scene={args.scene} tris={int(scene.tri_valid.sum())} "
          f"chunks={C}x{chunk} sub_box={scene.walk_sub_box.shape}")

    r = args.res * args.res
    pos, inv_view, inv_proj = cam.raygen_params(args.res, args.res)
    o, d = generate_rays(pos, inv_view, inv_proj, args.res, args.res)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)

    # closest hit (walk route) for per-ray t bounds
    hit = intersect_closest(scene, o, d, method="walk")
    t_hit = np.asarray(jnp.where(hit.hit, hit.t, 100.0))

    # bounce-1-like wavefront: cosine-ish random directions from hit points
    rng = np.random.default_rng(0)
    o_np, d_np = np.asarray(o), np.asarray(d)
    hp = o_np + t_hit[:, None] * d_np * 0.999
    rd = rng.normal(size=(r, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    # flip into the backfacing hemisphere of the incoming ray
    flip = (rd * d_np).sum(1) > 0
    rd[flip] = -rd[flip]
    o2, d2 = jnp.asarray(hp), jnp.asarray(rd)
    hit2 = intersect_closest(scene, o2, d2, tmin=1e-3, method="walk")
    t_hit2 = np.asarray(jnp.where(hit2.hit, hit2.t, 100.0))

    def box_stats(name, box_rows, o, d, t_ray, grain):
        """box_rows: [6, C'] AABB rows. Computes per-ray and per-block
        candidate counts at this grain."""
        nb = box_rows.shape[1]
        perm = np.asarray(wk._coherence_perm(scene, o, d))
        o_s, d_s = np.asarray(o)[perm], np.asarray(d)[perm]
        t_s = np.asarray(t_ray)[perm]
        inv = np.where(np.abs(d_s) > 1e-12, 1.0 / d_s, 1e12)
        bn = np.asarray(box_rows[:3]).T  # [C', 3]
        bx = np.asarray(box_rows[3:]).T

        blk = wk.RAY_SUB * 128
        n_blocks = r // blk
        per_ray_hit = np.zeros(r, np.int64)       # slab pass, t_near <= t_ray
        per_ray_all = np.zeros(r, np.int64)       # slab pass, t_near <= 100
        blk_union = np.zeros(n_blocks, np.int64)  # any ray passes (tmax=100)
        blk_swept = np.zeros(n_blocks, np.int64)  # t_near <= max block t_hit

        for s in range(0, r, 8192):
            e = min(s + 8192, r)
            O, D, I = o_s[s:e, None, :], d_s[s:e, None, :], inv[s:e, None, :]
            t0 = (bn[None] - O) * I
            t1 = (bx[None] - O) * I
            tn = np.minimum(t0, t1).max(-1)
            tf = np.maximum(t0, t1).min(-1)
            ok = (tn <= tf) & (tf >= 0)
            per_ray_all[s:e] = (ok & (tn <= 100.0)).sum(-1)
            per_ray_hit[s:e] = (ok & (tn <= t_s[s:e, None] + 1e-4)).sum(-1)
            # per-block at this row range
            for b0 in range(s, e, blk):
                bi = b0 // blk
                sl = slice(b0 - s, b0 - s + blk)
                blk_union[bi] = (ok[sl] & (tn[sl] <= 100.0)).any(0).sum()
                tmaxb = t_s[b0:b0 + blk].max()
                blk_swept[bi] = (ok[sl].any(0)
                                 & (tn[sl].min(0) <= tmaxb + 1e-4)).sum()

        def p(a):
            return (f"mean {a.mean():7.1f}  p50 {np.percentile(a, 50):6.0f}"
                    f"  p95 {np.percentile(a, 95):6.0f}  max {a.max():6d}")
        print(f"[{name} grain={grain}] n_boxes={nb}")
        print(f"  per-ray exact (own t bound):   {p(per_ray_hit)}")
        print(f"  per-ray exact (tmax=100):      {p(per_ray_all)}")
        print(f"  per-block union (traversal):   {p(blk_union)}")
        print(f"  per-block swept (early exit):  {p(blk_swept)}")
        print(f"  tri-tests/ray: block-swept {blk_swept.mean() * grain:9.0f}"
              f"  per-ray-floor {per_ray_hit.mean() * grain:9.0f}")

    box_c = np.asarray(wk._chunk_boxes(scene)[0]).reshape(6, -1)
    box_s = np.asarray(scene.walk_sub_box)
    for label, (oo, dd, tt) in (("primary", (o, d, t_hit)),
                                ("bounce1", (o2, d2, t_hit2))):
        box_stats(label, box_c, oo, dd, tt, chunk)
        box_stats(label, box_s, oo, dd, tt, 128)

    # --- wall-clock split: traversal+sort vs sweep (closest, primaries)
    import jax
    f_full = jax.jit(lambda s, o, d: wk.intersect_closest_raw(s, o, d))

    def trav_only(s, o, d):
        box, n_chunks, chunkz = wk._chunk_boxes(s)
        rays, rr, g, n_groups = wk._prep_rays(
            o, d, 0.0, 100.0, n_chunks, chunkz)
        outs = []
        for planes in [[p[i] for p in rays] for i in range(n_groups)]:
            outs.append(wk._candidates(s, planes, g)[:3])
        return outs

    f_trav = jax.jit(trav_only)

    def timeit(f, *a, reps=5):
        out = f(*a)
        jax.block_until_ready(out)
        out = f(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps * 1e3

    for label, (oo, dd) in (("primary", (o, d)), ("bounce1", (o2, d2))):
        ms_full = timeit(f_full, scene, oo, dd)
        ms_trav = timeit(f_trav, scene, oo, dd)
        print(f"[time {label}] full {ms_full:7.1f} ms   traversal+sort "
              f"{ms_trav:7.1f} ms   sweep ~{ms_full - ms_trav:7.1f} ms "
              f"({r / ms_full / 1e3:.2f} Mrays/s)")


if __name__ == "__main__":
    main()
