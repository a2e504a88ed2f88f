"""Checkpoint/resume and lost-shard recovery tests (SURVEY.md sections
5.3-5.4 obligations the reference has no answer to: its only state is a GL
accumulation FBO lost on exit, `OptixView.cpp:99-100,163-168`).

  * resume: render N spp with a checkpoint in the middle, kill the first
    run at the checkpoint, resume - the image must be bit-identical to an
    uninterrupted render (deterministic RNG + exact accumulator round-trip).
  * sharded production path: the `sharded` config flag must actually shard
    (config5's flag was dead in round 1) and agree with the single-device
    render.
  * lost shard: any row block is recomputable from (scene, seed, tile)
    alone and must match the rows of the full-frame render.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optixpathtracer_tpu.config import RenderConfig
from optixpathtracer_tpu.dist import make_mesh, render_rows
from optixpathtracer_tpu.integrate.path import render_sample
from optixpathtracer_tpu.render import render_config
from optixpathtracer_tpu.scene import flatten_model
from optixpathtracer_tpu.scene.procedural import PRESETS


@pytest.fixture(scope="module")
def cornell():
    model, camera, lights = PRESETS["scene3_cornell"]()
    return flatten_model(model, lights), camera


def _cfg(tmp_path, **kw):
    base = dict(scene="scene3_cornell", width=16, height=16, spp=8,
                max_bounces=1, intersect="brute", log_every=0)
    base.update(kw)
    return RenderConfig(**base)


def test_resume_bit_identical(tmp_path, cornell):
    scene, camera = cornell
    ckpt = str(tmp_path / "r.ckpt.npz")

    # uninterrupted 8-spp render
    cfg_full = _cfg(tmp_path)
    img_full = render_config(cfg_full, scene, camera)

    # interrupted: run 4 spp (checkpoint_every=4 -> checkpoint at 4), then
    # resume the same config to completion
    cfg_half = _cfg(tmp_path, spp=4, checkpoint=ckpt, checkpoint_every=4)
    render_config(cfg_half, scene, camera)
    assert os.path.exists(ckpt)
    cfg_resume = _cfg(tmp_path, spp=8, checkpoint=ckpt, checkpoint_every=4)
    img_resumed = render_config(cfg_resume, scene, camera)

    # identical program + exact accumulator round-trip -> bit-identical
    np.testing.assert_array_equal(np.asarray(img_full),
                                  np.asarray(img_resumed))


def test_batched_spp_loop_bit_identical(tmp_path, cornell):
    """The on-device fori_loop spp batching (frames_per_launch > 1) must be
    bit-identical to one-launch-per-sample: same frame seeds, same
    running-mean recurrence, only the dispatch granularity changes."""
    scene, camera = cornell
    img_per_sample = render_config(_cfg(tmp_path, frames_per_launch=1),
                                   scene, camera)
    img_batched = render_config(_cfg(tmp_path, frames_per_launch=8),
                                scene, camera)
    np.testing.assert_array_equal(np.asarray(img_per_sample),
                                  np.asarray(img_batched))


def test_sharded_config_flag_renders_sharded(tmp_path, cornell):
    """config5_full.json's `sharded: true` path: render_config must route
    through the mesh (round 1 shipped this flag dead)."""
    scene, camera = cornell
    img_single = render_config(_cfg(tmp_path, spp=2), scene, camera)
    img_sharded = render_config(_cfg(tmp_path, spp=2, sharded=True),
                                scene, camera)
    a, b = np.asarray(img_single), np.asarray(img_sharded)
    close = np.isclose(a, b, atol=1e-5, rtol=1e-4).all(axis=-1)
    # same tolerance story as test_dist: fusion-order rounding can flip
    # knife-edge hits on isolated pixels
    assert close.mean() > 0.99, f"only {close.mean():.3f} of pixels match"
    np.testing.assert_allclose(a.mean(), b.mean(), rtol=2e-2)


def test_config5_schema_loads_and_shards():
    """The shipped flagship config actually parses and requests sharding."""
    cfg = RenderConfig.from_json(
        os.path.join(os.path.dirname(__file__), "..", "scenes",
                     "config5_full.json"))
    assert cfg.sharded is True
    assert cfg.height % len(jax.devices()) == 0


def test_lost_shard_recovery(cornell):
    """Recompute one 2-row shard purely from (scene, camera, frame, y0) and
    compare against the full frame's rows."""
    scene, camera = cornell
    w, h = 16, 16
    pos, iv, ip = camera.raygen_params(w, h)
    full = np.asarray(render_sample(scene, pos, iv, ip, w, h, jnp.uint32(5),
                                    max_bounces=2, intersect_method="brute"))
    y0, rows = 6, 2
    tile = np.asarray(render_rows(scene, pos, iv, ip, w, h, jnp.uint32(5),
                                  jnp.uint32(y0), rows, max_bounces=2,
                                  intersect_method="brute"))
    close = np.isclose(full[y0:y0 + rows], tile, atol=1e-5,
                       rtol=1e-4).all(axis=-1)
    assert close.mean() > 0.99
    np.testing.assert_allclose(full[y0:y0 + rows].mean(), tile.mean(),
                               rtol=2e-2)


def test_mesh_spans_all_devices():
    mesh = make_mesh()
    assert mesh.devices.size == len(jax.devices()) >= 8
