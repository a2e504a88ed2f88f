"""Benchmark entry point: prints ONE JSON line with the headline metric.

Three measurements (VERDICT r2 items 3/4: the round-1 bench was blind to
the walk kernel, textures, the layered BSDF, and the backward pass):

  value            Mrays/s forward on the Cornell preset (256x256, 2 bounces
                   + NEE) - kept as the headline for vs_baseline continuity
                   with rounds 1-2.
  hall_mrays_s     Mrays/s forward on the 338k-triangle textured multi-
                   material hall preset (all 5 material types, alpha-cutout
                   foliage) - exercises the chunk-BVH walk kernels, the
                   layered BSDF, and texturing: the real production path.
  fwd_bwd_mrays_s  Mrays/s through a full material-gradient training step
                   (render + L2 loss + grad wrt the material table) on the
                   layered material-test scene - the BASELINE.md
                   "forward+backward" headline. Ray accounting counts the
                   forward rays (pixels*bounces*2); the backward sweep's
                   extra work lands in the denominator, so this number is
                   directly comparable to the forward ones.

Ray accounting: every bounce processes the full wavefront (radiance ray +
NEE shadow ray per lane per bounce), so rays = pixels * bounces * 2 per
frame.

vs_baseline: ratio against the oldest recorded BENCH_r*.json headline (the
round-1 number). The reference publishes no throughput numbers to compare
against (BASELINE.md).
"""
import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _bench(fn, *args):
    """Compile + warm, then time one repetition."""
    fn(*args).block_until_ready()
    t0 = time.time()
    out = fn(*args)
    out.block_until_ready()
    return time.time() - t0


def main():
    import jax
    import jax.numpy as jnp

    from optixpathtracer_tpu.dist import make_mesh, material_grad_step
    from optixpathtracer_tpu.integrate.path import render_sample
    from optixpathtracer_tpu.scene import flatten_model
    from optixpathtracer_tpu.scene.flatten import (scene_active_lobes,
        scene_flat_shading, scene_uses_textures)
    from optixpathtracer_tpu.integrate.cutout import scene_uses_alpha_cutout
    from optixpathtracer_tpu.scene.procedural import PRESETS

    max_bounces = 2

    def forward_mrays(preset, width, height, frames):
        model, camera, lights = PRESETS[preset]()
        scene = flatten_model(model, lights)
        lobes = scene_active_lobes(scene)
        use_tex = scene_uses_textures(scene)
        flat = scene_flat_shading(scene)
        cutout = scene_uses_alpha_cutout(scene)
        pos, inv_view, inv_proj = camera.raygen_params(width, height)

        # One jitted program runs ALL frames on-device (lax.fori_loop) so
        # the measurement sees compute, not per-frame dispatch.
        @jax.jit
        def render_accum(scene):
            def body(s, acc):
                frame = render_sample(scene, pos, inv_view, inv_proj,
                                      width, height, s.astype(jnp.uint32),
                                      max_bounces, "auto", False, lobes,
                                      use_tex, use_alpha_cutout=cutout,
                                      flat_shading=flat)
                return acc + frame
            return jax.lax.fori_loop(
                0, frames, body, jnp.zeros((height, width, 3), jnp.float32))

        dt = _bench(render_accum, scene)
        rays = frames * width * height * max_bounces * 2
        return rays / dt / 1e6

    def measure(name, fn):
        """Run one measurement; report it immediately (stderr) so a later
        crash cannot zero numbers already computed (VERDICT r3 weak #2)."""
        try:
            val = fn()
            print(f"[bench] {name} = {val:.3f} Mrays/s", file=sys.stderr,
                  flush=True)
            return val
        except Exception as e:  # keep the other measurements alive
            import traceback
            traceback.print_exc()
            print(f"[bench] {name} FAILED: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)
            return None

    # 1) headline: Cornell forward (rounds 1-2 continuity)
    cornell = measure(
        "cornell_fwd", lambda: forward_mrays("scene3_cornell", 256, 256,
                                             frames=8))

    # 2) hall forward: 338k tris, walk kernels, textures, all lobes
    hall = measure("hall_fwd", lambda: forward_mrays("hall", 256, 256,
                                                     frames=2))

    # 3) fwd+bwd: material-gradient TRAINING LOOP on the layered scene.
    # Round-5 shape (VERDICT r4 item 3): 256x256 and the whole multi-step
    # loop runs on-device (lax.fori_loop chaining material_grad_step's
    # updated scene into the next step), so the number is a production
    # training-loop rate, not a single dispatch-sensitive step.
    def fwd_bwd_mrays():
        model, camera, lights = PRESETS["layered"]()
        scene = flatten_model(model, lights)
        lobes = scene_active_lobes(scene)
        width = height = 256
        steps = 4
        cam_params = camera.raygen_params(width, height)
        mesh = make_mesh(1)
        target = jnp.zeros((height, width, 3), jnp.float32)

        @jax.jit
        def train(s):
            def body(i, s):
                new_s, _ = material_grad_step(
                    mesh, s, cam_params, target, width, height,
                    i.astype(jnp.uint32), max_bounces=max_bounces,
                    active_lobes=lobes)
                return new_s
            return jax.lax.fori_loop(0, steps, body, s).mat_albedo

        dt = _bench(train, scene)
        return steps * width * height * max_bounces * 2 / dt / 1e6

    fwd_bwd = measure("fwd_bwd", fwd_bwd_mrays)

    baseline = None
    for path in sorted(glob.glob(os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "BENCH_r*.json")),
            key=lambda p: int(re.search(r"r(\d+)", p).group(1))):
        try:
            with open(path) as f:
                prev = json.load(f)
            # the driver wraps our line under "parsed"; accept both shapes
            rec = prev.get("parsed") or prev
            baseline = float(rec["value"])
            break
        except Exception:
            continue

    rnd = lambda x: round(x, 3) if x is not None else None
    vs = cornell / baseline if (baseline and cornell) else 1.0
    print(json.dumps({
        "metric": "Mrays/s (fwd path trace, cornell 256x256, 2 bounces+NEE)",
        "value": rnd(cornell),
        "unit": "Mrays/s",
        "vs_baseline": round(vs, 3),
        "hall_mrays_s": rnd(hall),
        "fwd_bwd_mrays_s": rnd(fwd_bwd),
    }))
    if cornell is None or hall is None or fwd_bwd is None:
        sys.exit(1)


if __name__ == "__main__":
    main()
