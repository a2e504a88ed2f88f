"""Phase split of the packet engine on a given scene/wavefront:
candidates (dense exact chunk tests + sort) vs packet words (exact
per-ray subchunk masks) vs sweep kernel."""
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
    from optixpathtracer_tpu.intersect import packet_kernels as pk
    from optixpathtracer_tpu.intersect import walk_kernels as wk
    from optixpathtracer_tpu.intersect.api import intersect_closest

    model, cam, lights = PRESETS[args.scene]()
    scene = flatten_model(model, lights)
    r = args.res * args.res
    pos, iv, ip = cam.raygen_params(args.res, args.res)
    o, d = generate_rays(pos, iv, ip, args.res, args.res)
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)

    hit = intersect_closest(scene, o, d, method="walk")
    t_hit = np.asarray(jnp.where(hit.hit, hit.t, 100.0))
    rng = np.random.default_rng(0)
    o_np, d_np = np.asarray(o), np.asarray(d)
    hp = o_np + t_hit[:, None] * d_np * 0.999
    rd = rng.normal(size=(r, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    flip = (rd * d_np).sum(1) > 0
    rd[flip] = -rd[flip]
    o2, d2 = jnp.asarray(hp), jnp.asarray(rd)

    def timeit(f, *a, reps=5):
        out = f(*a)
        jax.block_until_ready(out)
        out = f(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps * 1e3, out

    def stage_prep(s, o, d):
        perm = pk._coherence_perm(s, o, d)
        o, d = o[perm], d[perm]
        _, n_chunks, chunk = pk._chunk_boxes(s)
        trav, rall, r_, g, n_groups = pk._prep_rays_packet(
            o, d, 0.0, 100.0, n_chunks, chunk)
        return trav, rall, g, n_groups

    def stage_cand(s, o, d):
        trav, rall, g, n_groups = stage_prep(s, o, d)
        outs = [pk._candidates(s, [p[i] for p in trav], g)[:3]
                for i in range(n_groups)]
        return outs

    def stage_words(s, o, d):
        trav, rall, g, n_groups = stage_prep(s, o, d)
        outs = []
        for i in range(n_groups):
            cand, tnear, count, maxc_pad = pk._candidates(
                s, [p[i] for p in trav], g)
            outs.append(pk._packet_words(s, rall[i], cand, tnear, g,
                                         maxc_pad))
        return outs

    f_full = jax.jit(lambda s, o, d: pk.intersect_closest_raw(s, o, d))
    f_cand = jax.jit(stage_cand)
    f_words = jax.jit(stage_words)

    for label, (oo, dd) in (("primary", (o, d)), ("bounce1", (o2, d2))):
        ms_c, _ = timeit(f_cand, scene, oo, dd)
        ms_w, _ = timeit(f_words, scene, oo, dd)
        ms_f, _ = timeit(f_full, scene, oo, dd)
        print(f"[packet {label}] candidates {ms_c:6.1f}  +words "
              f"{ms_w:6.1f}  full {ms_f:6.1f}  -> sweep ~"
              f"{ms_f - ms_w:6.1f} ms")


if __name__ == "__main__":
    main()
