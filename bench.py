"""Benchmark entry point: prints ONE JSON line with the headline metric.

Measures wavefront path-tracing throughput (Mrays/s) on the default device
(real TPU under the driver; CPU elsewhere): Cornell preset, 256x256, 2
bounces + NEE shadow rays, 1-spp frames after a compile warmup.

Ray accounting: every bounce processes the full wavefront (radiance ray +
NEE shadow ray per lane per bounce) - that is the work the machine does, so
rays = pixels * bounces * 2 per frame.

vs_baseline: ratio against the oldest recorded BENCH_r*.json (the round-1
number), or 1.0 on the first round. The reference publishes no throughput
numbers to compare against (BASELINE.md).
"""
import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp

    from optixpathtracer_tpu.integrate.path import render_sample
    from optixpathtracer_tpu.scene import flatten_model
    from optixpathtracer_tpu.scene.flatten import (scene_active_lobes,
        scene_flat_shading, scene_uses_textures)
    from optixpathtracer_tpu.scene.procedural import PRESETS

    width = height = 256
    max_bounces = 2
    frames = 8

    model, camera, lights = PRESETS["scene3_cornell"]()
    scene = flatten_model(model, lights)
    lobes = scene_active_lobes(scene)
    use_tex = scene_uses_textures(scene)
    flat = scene_flat_shading(scene)
    pos, inv_view, inv_proj = camera.raygen_params(width, height)

    # One jitted program runs ALL frames on-device (lax.fori_loop) so the
    # measurement sees compute, not per-frame dispatch over the host link.
    @jax.jit
    def render_accum(scene):
        def body(s, acc):
            frame = render_sample(scene, pos, inv_view, inv_proj,
                                  width, height, s.astype(jnp.uint32),
                                  max_bounces, "auto", False, lobes,
                                  use_tex, flat_shading=flat)
            return acc + frame
        return jax.lax.fori_loop(
            0, frames, body, jnp.zeros((height, width, 3), jnp.float32))

    render_accum(scene).block_until_ready()  # warmup / compile

    t0 = time.time()
    render_accum(scene).block_until_ready()
    dt = time.time() - t0

    rays = frames * width * height * max_bounces * 2
    mrays = rays / dt / 1e6

    baseline = None
    for path in sorted(glob.glob(os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "BENCH_r*.json")),
            key=lambda p: int(re.search(r"r(\d+)", p).group(1))):
        try:
            with open(path) as f:
                prev = json.load(f)
            baseline = float(prev["value"])
            break
        except Exception:
            continue

    vs = mrays / baseline if baseline else 1.0
    print(json.dumps({
        "metric": "Mrays/s (fwd path trace, cornell 256x256, 2 bounces+NEE)",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
