"""Inverse-rendering fit of the golden-scene materials.

The five README scenes' glTF assets are not shipped with the reference
(`main.cpp:7` "assets/Models/TestScenes/1/untitled.gltf"); the repo
reconstructs them procedurally (scene/procedural.py GOLDEN_GEO) and the
round-2 coordinate-descent fit landed in a dark local minimum. This script
uses the framework's own differentiable render path - the very capability
the reference lacks - to gradient-fit the MATERIAL TABLE (per-material
albedo) against a golden PNG: Adam on
mean((srgb(render(albedo)) - golden)^2), stochastic 1-spp frames per step.

Geometry stays fixed (hit ids detach, intersect/api.py); lights stay at the
reference's published values (`main.cpp:13-17` color = vec3(1)).

Usage:
    python benchmarks/fit_goldens.py [--scene diffuse] [--steps 150]
        [--width 240] [--height 135] [--spp-per-step 2] [--lr 0.05]
Prints fitted GOLDEN_GEO-style values (sphere_rgb, back_rgb, green_rgb,
blue_rgb) to paste into scene/procedural.py.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="diffuse")
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--width", type=int, default=240)
    ap.add_argument("--height", type=int, default=135)
    ap.add_argument("--spp-per-step", type=int, default=2)
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--segments", default="12,24")
    ap.add_argument("--method", default="auto")
    ap.add_argument("--eval-spp", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from benchmarks.accuracy import load_golden
    from optixpathtracer_tpu.film.color import linear_to_srgb
    from optixpathtracer_tpu.integrate.path import render_chunk
    from optixpathtracer_tpu.scene import flatten_model
    from optixpathtracer_tpu.scene.flatten import (scene_active_lobes,
        scene_flat_shading, scene_uses_textures)
    from optixpathtracer_tpu.scene.procedural import scene_material_test

    seg = tuple(int(x) for x in args.segments.split(","))
    model, camera, lights = scene_material_test(args.scene, segments=seg)
    scene = flatten_model(model, lights)
    lobes = scene_active_lobes(scene)
    use_tex = scene_uses_textures(scene)
    flat = scene_flat_shading(scene)
    w, h = args.width, args.height
    pos, iv, ip = camera.raygen_params(w, h)
    golden = jnp.asarray(load_golden(args.scene, w, h, pbrt=True))

    # parameterize albedo through a sigmoid so the fit stays in (0, 1)
    a0 = jnp.clip(scene.mat_albedo, 1e-3, 1.0 - 1e-3)
    logits0 = jnp.log(a0 / (1.0 - a0))

    def render_with(albedo, frame0):
        s = scene._replace(mat_albedo=albedo)
        acc = jnp.zeros((h, w, 3), jnp.float32)
        # running mean over spp_per_step frames starting at frame0 -
        # stochastic loss, fresh sample set each optimizer step
        img = render_chunk(s, pos, iv, ip, w, h, acc, frame0,
                           args.spp_per_step, 2, args.method, False, lobes,
                           use_tex, False, flat_shading=flat)
        # render_chunk's running mean divides by global frame id + 1: undo
        # to a plain mean over the chunk (frame0 offsets the weights)
        return img * (frame0.astype(jnp.float32) + args.spp_per_step) \
            / args.spp_per_step

    def loss_fn(logits, frame0):
        albedo = jax.nn.sigmoid(logits)
        img = render_with(albedo, frame0)
        return jnp.mean((linear_to_srgb(jnp.clip(img, 1e-6, None))
                         - golden) ** 2)

    opt = optax.adam(args.lr)

    @jax.jit
    def step(logits, opt_state, frame0):
        loss, g = jax.value_and_grad(loss_fn)(logits, frame0)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(logits, updates), opt_state, loss

    logits = logits0
    opt_state = opt.init(logits)
    t0 = time.time()
    for i in range(args.steps):
        frame0 = jnp.uint32(i * args.spp_per_step)
        logits, opt_state, loss = step(logits, opt_state, frame0)
        if i % 10 == 0 or i == args.steps - 1:
            print(json.dumps({"step": i, "loss": float(loss),
                              "sec": round(time.time() - t0, 1)}),
                  flush=True)

    albedo = np.asarray(jax.nn.sigmoid(logits))

    # mesh order in scene_material_test: 36 spheres, then walls
    # [back, green, blue, floor, ceiling]; flatten keeps mesh order
    n_sph = 36
    out = {
        "sphere_rgb": albedo[:n_sph].mean(axis=0).round(4).tolist(),
        "back_rgb": albedo[[n_sph, n_sph + 3, n_sph + 4]].mean(
            axis=0).round(4).tolist(),
        "green_rgb": albedo[n_sph + 1].round(4).tolist(),
        "blue_rgb": albedo[n_sph + 2].round(4).tolist(),
    }
    print("fitted:", json.dumps(out), flush=True)

    # final eval at eval_spp with the fitted albedos
    from optixpathtracer_tpu.film.metrics import flip, mse
    img = render_with(jnp.asarray(albedo), jnp.uint32(0))
    acc = jnp.zeros((h, w, 3), jnp.float32)
    img = render_chunk(scene._replace(mat_albedo=jnp.asarray(albedo)),
                       pos, iv, ip, w, h, acc, jnp.uint32(0), args.eval_spp,
                       2, args.method, False, lobes, use_tex, False,
                       flat_shading=flat)
    ours = np.clip(np.asarray(linear_to_srgb(np.asarray(img))), 0, 1)
    g = np.asarray(golden)
    print(json.dumps({"eval_mse": float(mse(ours, g)),
                      "eval_flip": float(flip(g, ours,
                                              inputs_are_linear=False))}),
          flush=True)


if __name__ == "__main__":
    main()
