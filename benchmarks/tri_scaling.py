"""Triangle-count scaling benchmark for the intersection kernels.

The reference's perf story is hardware log-time BVH traversal (`optixTrace`,
`devicePrograms.cu:248`); this sweep quantifies how the TPU kernels scale
with scene size (10^2 .. 10^6 triangles) - the proof VERDICT.md round 1
demanded. Run on the real TPU via `python benchmarks/tri_scaling.py
[--methods pallas,bvh] [--max-tris 1000000]`.

Scene: a grid of UV spheres in an open room - real occlusion structure, so
hierarchical culling has something to cull (a single huge sphere would let
any AABB scheme trivially skip 99% of chunks).
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def make_scene(target_tris: int):
    """Sphere-grid scene with ~target_tris triangles."""
    from optixpathtracer_tpu.scene import flatten_model
    from optixpathtracer_tpu.scene.procedural import (
        _room, uv_sphere)
    from optixpathtracer_tpu.scene.types import Material, Model, PointLight

    room = _room(3.0)
    room_tris = len(room.indices)
    budget = max(target_tris - room_tris, 16)
    # grid of k^3 spheres, each with enough segments to hit the budget
    k = min(6, max(1, round(budget ** (1 / 3) / 6)))
    n_spheres = k * k * k
    per = max(budget // n_spheres, 16)
    # uv_sphere tri count ~ 2 * n_theta * n_phi (minus poles)
    n_theta = max(3, int(math.sqrt(per / 4)))
    n_phi = 2 * n_theta
    mat = Material(base_color=np.array([0.7, 0.4, 0.3], np.float32),
                   roughness=0.4, mat_type="diffuse")
    meshes = [room]
    rng = np.random.default_rng(0)
    for i in range(k):
        for j in range(k):
            for l in range(k):
                c = (np.array([i, j, l]) / max(k - 1, 1) - 0.5) * 2.2
                c = c * np.array([0.8, 0.8, 0.8]) + np.array([0.0, 1.5, 0.0])
                r = 0.25 * 2.2 / max(k, 2) * (0.7 + 0.6 * rng.random())
                meshes.append(uv_sphere(r, tuple(c), n_theta, n_phi, mat,
                                        name=f"s{i}{j}{l}"))
    model = Model(meshes=meshes)
    from optixpathtracer_tpu.camera import Camera
    camera = Camera.from_blender((3.85382, 0.0, 1.5), (90.0, 0.0, 90.0))
    lights = [PointLight(np.array([0.0, 2.8, 0.0], np.float32),
                         np.ones(3, np.float32) * 2.0)]
    scene = flatten_model(model, lights)
    return scene, camera, lights


def bench_intersect(scene, camera, method: str, width=256, height=256,
                    reps=5, ray_mode="primary"):
    """Time closest-hit over one 65k-ray wavefront. ray_mode:
    'primary' = coherent camera rays; 'random' = uniformly random origins
    in the scene AABB x random directions - the worst-case incoherent
    bounce wavefront (no coherence for block culling to exploit)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from optixpathtracer_tpu.camera.camera import generate_rays
    from optixpathtracer_tpu.intersect import intersect_closest

    pos, iv, ip = camera.raygen_params(width, height)
    o, d = generate_rays(pos, iv, ip, width, height)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    if ray_mode == "random":
        r = width * height
        rng = np.random.default_rng(42)
        lo = np.asarray(scene.tri_v0).min(axis=0)
        hi = np.asarray(scene.tri_v0).max(axis=0)
        o = jnp.asarray(rng.uniform(lo, hi, (r, 3)), jnp.float32)
        v = rng.standard_normal((r, 3))
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        d = jnp.asarray(v, jnp.float32)

    @jax.jit
    def run(scene, o, d):
        hit = intersect_closest(scene, o, d, method=method)
        return hit.t, hit.tri_id

    t, i = run(scene, o, d)
    t.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        t, i = run(scene, o, d)
    t.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    return dt, width * height / dt / 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--methods", default="pallas",
                    help="comma list: pallas,brute,bvh,walk")
    ap.add_argument("--sizes", default="100,10000,100000,1000000")
    ap.add_argument("--ray-modes", default="primary",
                    help="comma list: primary,random")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    print(f"backend: {jax.default_backend()}", file=sys.stderr)

    results = []
    for target in [int(s) for s in args.sizes.split(",")]:
        scene, camera, _ = make_scene(target)
        n_tris = int(np.asarray(scene.tri_valid).sum())
        row = {"target": target, "tris": n_tris}
        for method in args.methods.split(","):
            for mode in args.ray_modes.split(","):
                tag = method if mode == "primary" else f"{method}_{mode}"
                try:
                    dt, mrps = bench_intersect(scene, camera, method,
                                               ray_mode=mode)
                    row[tag + "_ms"] = round(dt * 1e3, 3)
                    row[tag + "_mrays_s"] = round(mrps, 2)
                except Exception as e:  # noqa: BLE001 - report and continue
                    row[tag + "_error"] = str(e)[:200]
        print(json.dumps(row), flush=True)
        results.append(row)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
