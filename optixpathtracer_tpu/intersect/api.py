"""Unified intersection API with the differentiability contract.

Design (SURVEY.md section 7 stage 6): the *discrete* part of intersection
(which triangle, did it hit) is inherently non-differentiable and runs
detached - whether it came from the brute-force oracle, the JAX BVH walk, or
the Pallas kernel. The *continuous* part (t, barycentrics) is then recomputed
in a few differentiable FLOPs from the detached tri_id, so gradients flow
from pixels to ray origins/directions and to the triangle vertices without
any custom_vjp on the traversal kernels. Hit parameters are piecewise-smooth
in geometry; material gradients (the BASELINE.md target) are exact.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.math import cross, dot
from . import brute, bvh_traverse
from .types import Hit

# Scenes below this triangle count use a dense all-pairs kernel (cheaper
# than divergent traversal); above it, the BVH.
BRUTE_FORCE_MAX_TRIS = 2048


# Below this chunk count the dense sweep's linear cull is cheaper than
# skip-link traversal overhead (small scenes fit a handful of chunks).
WALK_MIN_CHUNKS = 8


PACKET_BOUNCE_MIN_CHUNKS = 512  # scenes with fewer walk chunks keep the
                                # walk sweep even for bounce wavefronts
                                # (per-packet overheads beat the union
                                # savings on small candidate sets)


def _resolve(method: str, scene) -> str:
    # "auto:bounce" = auto routing with the hint that this wavefront is a
    # secondary-bounce one (incoherent directions). Measured on hall
    # (338k tris, benchmarks/hall_engines.py r5): per-1024-ray-block
    # candidate unions are ~49x the per-ray need on bounce wavefronts, so
    # the per-8-ray-packet engine wins 3.2x there (162->51 ms closest),
    # while primaries stay with the whole-block walk sweep (33 vs 36 ms).
    bounce = method == "auto:bounce"
    if bounce:
        method = "auto"
    if method != "auto":
        return method
    n = scene.tri_v0.shape[0]
    if jax.default_backend() == "tpu":
        # Measured crossover table on v5e (65k-ray wavefronts, Mrays/s;
        # WALK_BENCH.json r3/r4 dense_baseline + rounds + r4_packet):
        #
        #   tris   | dense | walk | rs32 | packet |   regime
        #   10k    | 6.7   |  -   |  -   |   -    | dense wins (few chunks)
        #   100k   | 2.4   | 2.4  |  -   | 1.4    | walk == dense, keep walk
        #   1M pri | 0.45  | 0.59 |0.59  | 0.71   | packet best, walk close
        #   1M rnd | 1.2   | 1.24 |6.63  | 1.0    | rs32 walk best incoherent
        #
        # ('rs32' = the walk kernel with OPT_WALK_RAY_SUB=32, i.e.
        # 4096-ray blocks: incoherent blocks see near-whole-scene
        # candidate unions at ANY block size, so the bigger block wins
        # back traversal/dispatch amortization - WALK_BENCH.json
        # r3_walk_rs32_variant.)
        #
        # The dense sweep also beats the vmapped while-loop BVH by ~45x
        # at 20k tris (gather-heavy divergent traversal is pathological
        # on TPU). Routing: small scenes dense; everything else walk.
        # 'packet' stays available for coherent primary-heavy workloads
        # at >=1M tris.
        if (scene.walk_tris.shape[0] >= WALK_MIN_CHUNKS):
            if bounce and scene.walk_tris.shape[0] >= \
                    PACKET_BOUNCE_MIN_CHUNKS:
                return "packet"
            return "walk"
        return "pallas"
    return "brute" if n <= BRUTE_FORCE_MAX_TRIS else "bvh"


def _engine(method: str):
    if method == "pallas":
        from . import pallas_kernels
        return pallas_kernels
    if method == "walk":
        from . import walk_kernels
        return walk_kernels
    if method == "packet":
        from . import packet_kernels
        return packet_kernels
    return brute if method == "brute" else bvh_traverse


def _refine(scene, o, d, hit: Hit, tmax):
    """Differentiably recompute (t, u, v) from the detached tri_id."""
    safe_id = jnp.maximum(hit.tri_id, 0)
    v0 = scene.tri_v0[safe_id]
    e1 = scene.tri_e1[safe_id]
    e2 = scene.tri_e2[safe_id]
    pvec = cross(d, e2)
    det = dot(e1, pvec)
    ok = jnp.abs(det) > 1e-12
    inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    tvec = o - v0
    u = dot(tvec, pvec) * inv_det
    qvec = cross(tvec, e1)
    v = dot(d, qvec) * inv_det
    t = dot(e2, qvec) * inv_det
    live = hit.hit & ok
    return Hit(
        t=jnp.where(live, t, tmax),
        tri_id=hit.tri_id,
        u=jnp.where(live, u, 0.0),
        v=jnp.where(live, v, 0.0),
        hit=live,
        # recomputed here so engines only need to report (t, tri_id)
        back_face=live & (det < 0.0),
    )


def intersect_closest(scene, o, d, tmin=0.0, tmax=100.0, method="auto"):
    """Closest-hit query with differentiable refinement. method in
    {'auto', 'auto:bounce', 'brute', 'bvh', 'pallas', 'walk', 'packet'}
    ('auto' routes per backend and scene size; 'auto:bounce' additionally
    hints an incoherent secondary-bounce wavefront, routing big scenes to
    the per-8-ray-packet engine - see _resolve)."""
    engine = _engine(_resolve(method, scene))
    o_det = jax.lax.stop_gradient(o)
    d_det = jax.lax.stop_gradient(d)
    scene_det = jax.lax.stop_gradient(scene)
    # tmin/tmax must be detached too: callers pass values derived from hit
    # positions (which carry material-parameter tangents from bounce 1 on),
    # and a nonzero tangent entering a Pallas engine aborts its JVP trace.
    tmin = jax.lax.stop_gradient(tmin)
    tmax = jax.lax.stop_gradient(tmax)
    raw = engine.intersect_closest(scene_det, o_det, d_det, tmin, tmax)
    raw = jax.tree.map(jax.lax.stop_gradient, raw)
    tmax_arr = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32),
                                o.shape[:-1])
    return _refine(scene, o, d, raw, tmax_arr)


def intersect_any(scene, o, d, tmin=0.0, tmax=100.0, method="auto"):
    """Occlusion query (boolean, non-differentiable by design - visibility
    is a step function; its gradient contribution is dropped as in standard
    detached-sampling differentiable renderers). method as in
    intersect_closest. Every input is detached, including tmin/tmax: the
    NEE shadow_tmax is derived from surf.position and would otherwise leak
    material tangents into the Pallas kernels (TPU JVP abort)."""
    engine = _engine(_resolve(method, scene))
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    scene = jax.lax.stop_gradient(scene)
    tmin = jax.lax.stop_gradient(tmin)
    tmax = jax.lax.stop_gradient(tmax)
    blocked = engine.intersect_any(scene, o, d, tmin, tmax)
    return jax.lax.stop_gradient(blocked)
