"""Hierarchical walk kernel (intersect/walk_kernels.py) vs the brute-force
oracle, in Pallas interpret mode on CPU. The driver exercises the compiled
path and the >=100k-triangle scaling proof on real TPU
(benchmarks/tri_scaling.py)."""
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from optixpathtracer_tpu.camera import Camera
from optixpathtracer_tpu.camera.camera import generate_rays
from optixpathtracer_tpu.intersect import brute, walk_kernels
from optixpathtracer_tpu.scene import Material, Model, PointLight, flatten_model
from optixpathtracer_tpu.scene.procedural import quad, uv_sphere


def _make(n_spheres_side=2, segs=6):
    """Multi-chunk scene: a grid of spheres over a floor (~n^3 * 2*segs^2
    tris) so the chunk BVH has real structure to traverse."""
    mat = Material(mat_type="diffuse")
    meshes = [quad((-6.0, 0.0, -6.0), (0.0, 0.0, 12.0), (12.0, 0.0, 0.0),
                   mat)]
    k = n_spheres_side
    for i in range(k):
        for j in range(k):
            for l in range(k):
                c = (np.array([i, j, l], np.float64) - (k - 1) / 2) * 1.2
                c[1] += 2.0
                meshes.append(uv_sphere(0.4, tuple(c), segs, 2 * segs, mat,
                                        name=f"s{i}{j}{l}"))
    scene = flatten_model(Model(meshes=meshes),
                          [PointLight(np.array([2.0, 5.0, 1.0]),
                                      np.ones(3))])
    cam = Camera(position=np.array([5.0, 2.5, 0.2]),
                 rotation=np.array([-5.0, -90.0, 0.0]))
    pos, iv, ip = cam.raygen_params(40, 24)
    o, d = generate_rays(pos, iv, ip, 40, 24)
    return scene, o.reshape(-1, 3), d.reshape(-1, 3)


@pytest.fixture(scope="module")
def scene_and_rays():
    return _make()


def test_scene_is_multichunk(scene_and_rays):
    scene, _, _ = scene_and_rays
    assert scene.walk_tris.shape[0] >= 8, scene.walk_tris.shape


def test_closest_matches_oracle(scene_and_rays):
    scene, o, d = scene_and_rays
    expect = brute.intersect_closest(scene, o, d, 0.0, 100.0)
    with pltpu.force_tpu_interpret_mode():
        got = walk_kernels.intersect_closest(scene, o, d, 0.0, 100.0)
    np.testing.assert_array_equal(np.asarray(expect.hit),
                                  np.asarray(got.hit))
    m = np.asarray(expect.hit)
    assert m.any() and not m.all()
    np.testing.assert_array_equal(np.asarray(expect.tri_id)[m],
                                  np.asarray(got.tri_id)[m])
    np.testing.assert_allclose(np.asarray(expect.t)[m],
                               np.asarray(got.t)[m], rtol=1e-5)


def test_any_matches_oracle(scene_and_rays):
    scene, o, d = scene_and_rays
    expect = brute.intersect_any(scene, o, d, 0.0, 100.0)
    with pltpu.force_tpu_interpret_mode():
        got = walk_kernels.intersect_any(scene, o, d, 0.0, 100.0)
    np.testing.assert_array_equal(np.asarray(expect), np.asarray(got))


def test_any_offset_rays(scene_and_rays):
    """Shadow-style rays: origins on surfaces, random directions."""
    scene, o, d = scene_and_rays
    hit = brute.intersect_closest(scene, o, d, 0.0, 100.0)
    m = np.asarray(hit.hit)
    origins = np.asarray(o)[m] + np.asarray(hit.t[m, None] * d[m])
    rng = np.random.default_rng(1)
    dirs = rng.normal(size=origins.shape).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = origins.astype(np.float32) + 1e-3 * dirs
    expect = brute.intersect_any(scene, origins, dirs, 0.0, 10.0)
    with pltpu.force_tpu_interpret_mode():
        got = walk_kernels.intersect_any(scene, origins, dirs, 0.0, 10.0)
    np.testing.assert_array_equal(np.asarray(expect), np.asarray(got))


def test_tmax_respected(scene_and_rays):
    scene, o, d = scene_and_rays
    with pltpu.force_tpu_interpret_mode():
        near = walk_kernels.intersect_closest(scene, o, d, 0.0, 4.0)
        far = walk_kernels.intersect_closest(scene, o, d, 0.0, 100.0)
    assert (np.asarray(near.hit) <= np.asarray(far.hit)).all()
    got_t = np.asarray(near.t)[np.asarray(near.hit)]
    assert (got_t <= 4.0 + 1e-5).all()


def test_api_walk_method(scene_and_rays):
    """walk is reachable through the unified API and refines
    barycentrics."""
    from optixpathtracer_tpu.intersect import intersect_closest
    scene, o, d = scene_and_rays
    with pltpu.force_tpu_interpret_mode():
        got = intersect_closest(scene, o, d, method="walk")
    expect = brute.intersect_closest(scene, o, d, 0.0, 100.0)
    m = np.asarray(expect.hit)
    np.testing.assert_array_equal(m, np.asarray(got.hit))
    np.testing.assert_allclose(np.asarray(expect.u)[m],
                               np.asarray(got.u)[m], atol=1e-4)
