"""Engine shootout on the hall flagship: walk vs packet, closest + any,
primary + bounce-like wavefronts. Companion to hall_stats.py."""
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
    ap.add_argument("--engines", default="walk,packet")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from optixpathtracer_tpu.scene import flatten_model
    from optixpathtracer_tpu.scene.procedural import PRESETS
    from optixpathtracer_tpu.camera.camera import generate_rays
    from optixpathtracer_tpu.intersect.api import (intersect_closest,
                                                   intersect_any, _engine)

    model, cam, lights = PRESETS[args.scene]()
    scene = flatten_model(model, lights)
    r = args.res * args.res
    pos, inv_view, inv_proj = cam.raygen_params(args.res, args.res)
    o, d = generate_rays(pos, inv_view, inv_proj, args.res, args.res)
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

    ref = {}

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

    for eng in args.engines.split(","):
        mod = _engine(eng)
        fc = jax.jit(lambda s, o, d, m=mod: m.intersect_closest(s, o, d))
        fa = jax.jit(lambda s, o, d, m=mod: m.intersect_any(
            s, o, d, 1e-3, 30.0))
        for label, (oo, dd) in (("primary", (o, d)), ("bounce1", (o2, d2))):
            ms, out = timeit(fc, scene, oo, dd)
            ids = np.asarray(out.tri_id)
            key = ("closest", label)
            if key not in ref:
                ref[key] = ids
                agree = 1.0
            else:
                agree = (ids == ref[key]).mean()
            print(f"[{eng:7s} closest {label}] {ms:8.1f} ms "
                  f"({r / ms / 1e3:5.2f} Mrays/s)  id-agree {agree:.6f}")
            ms, out = timeit(fa, scene, oo, dd)
            blk = np.asarray(out)
            key = ("any", label)
            if key not in ref:
                ref[key] = blk
                agree = 1.0
            else:
                agree = (blk == ref[key]).mean()
            print(f"[{eng:7s} any     {label}] {ms:8.1f} ms "
                  f"({r / ms / 1e3:5.2f} Mrays/s)  agree {agree:.6f}")


if __name__ == "__main__":
    main()
