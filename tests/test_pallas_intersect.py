"""Pallas dense-intersection kernel vs the brute-force oracle (interpret
mode on CPU; the driver exercises the compiled path on real TPU)."""
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from optixpathtracer_tpu.camera.camera import generate_rays
from optixpathtracer_tpu.intersect import brute, pallas_kernels
from optixpathtracer_tpu.scene import Material, Model, PointLight, flatten_model
from optixpathtracer_tpu.scene.procedural import quad, uv_sphere


@pytest.fixture(scope="module")
def scene_and_rays():
    sphere = uv_sphere(0.5, (0.0, 0.5, 0.0), 10, 20,
                       Material(mat_type="diffuse"))
    floor = quad((-5.0, 0.0, -5.0), (0.0, 0.0, 10.0), (10.0, 0.0, 0.0),
                 Material(mat_type="diffuse"))
    scene = flatten_model(Model(meshes=[sphere, floor]),
                          [PointLight(np.array([2.0, 3.0, 1.0]),
                                      np.ones(3))])
    from optixpathtracer_tpu.camera import Camera
    cam = Camera(position=np.array([3.0, 1.0, 0.0]),
                 rotation=np.array([10.0, 180.0, 0.0]))
    pos, iv, ip = cam.raygen_params(32, 24)
    o, d = generate_rays(pos, iv, ip, 32, 24)
    return scene, o.reshape(-1, 3), d.reshape(-1, 3)


def test_closest_matches_oracle(scene_and_rays):
    scene, o, d = scene_and_rays
    expect = brute.intersect_closest(scene, o, d, 0.0, 100.0)
    with pltpu.force_tpu_interpret_mode():
        got = pallas_kernels.intersect_closest(scene, o, d, 0.0, 100.0)
    np.testing.assert_array_equal(np.asarray(expect.hit),
                                  np.asarray(got.hit))
    m = np.asarray(expect.hit)
    np.testing.assert_array_equal(np.asarray(expect.tri_id)[m],
                                  np.asarray(got.tri_id)[m])
    np.testing.assert_allclose(np.asarray(expect.t)[m],
                               np.asarray(got.t)[m], rtol=1e-5)


def test_any_matches_oracle(scene_and_rays):
    scene, o, d = scene_and_rays
    expect = brute.intersect_any(scene, o, d, 0.0, 100.0)
    with pltpu.force_tpu_interpret_mode():
        got = pallas_kernels.intersect_any(scene, o, d, 0.0, 100.0)
    np.testing.assert_array_equal(np.asarray(expect), np.asarray(got))


def test_tmax_respected(scene_and_rays):
    scene, o, d = scene_and_rays
    with pltpu.force_tpu_interpret_mode():
        near = pallas_kernels.intersect_closest(scene, o, d, 0.0, 1.0)
        far = pallas_kernels.intersect_closest(scene, o, d, 0.0, 100.0)
    # clipping tmax can only lose hits, never gain them
    assert (np.asarray(near.hit) <= np.asarray(far.hit)).all()
    got_t = np.asarray(near.t)[np.asarray(near.hit)]
    assert (got_t <= 1.0).all()
