"""End-to-end smoke tests: the minimum slice of SURVEY.md section 7 -
procedural scene -> flatten -> intersect -> path trace -> image, on CPU JAX.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from optixpathtracer_tpu.camera import Camera
from optixpathtracer_tpu.integrate import render
from optixpathtracer_tpu.scene import (Material, Model, PointLight,
                                       flatten_model)
from optixpathtracer_tpu.scene.procedural import quad, uv_sphere


@pytest.fixture(scope="module")
def simple_scene():
    sphere = uv_sphere(0.5, (0.0, 0.5, 0.0), 12, 24,
                       Material(base_color=np.array([0.8, 0.4, 0.3],
                                                    np.float32),
                                mat_type="diffuse"))
    floor = quad((-5.0, 0.0, -5.0), (0.0, 0.0, 10.0), (10.0, 0.0, 0.0),
                 Material(base_color=np.array([0.6, 0.6, 0.6], np.float32),
                          mat_type="diffuse"))
    model = Model(meshes=[sphere, floor])
    lights = [PointLight(np.array([2.0, 3.0, 1.0], np.float32),
                         np.array([20.0, 20.0, 20.0], np.float32))]
    scene = flatten_model(model, lights)
    camera = Camera(position=np.array([3.0, 1.0, 0.0]),
                    rotation=np.array([10.0, 180.0, 0.0]))
    return scene, camera


def test_render_produces_finite_nonblack(simple_scene):
    scene, camera = simple_scene
    img = render(scene, camera, 32, 32, spp=2, max_bounces=2,
                 intersect_method="brute")
    img = np.asarray(img)
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all()
    assert img.max() > 0.01  # the sphere is lit
    assert (img >= 0).all()


def test_brute_and_bvh_agree(simple_scene):
    """The BVH engine must match the brute-force oracle (SURVEY.md stage 3:
    'must match it bit-for-bit on hit ids')."""
    scene, camera = simple_scene
    from optixpathtracer_tpu.camera.camera import generate_rays
    from optixpathtracer_tpu.intersect import brute, bvh_traverse
    pos, iv, ip = camera.raygen_params(64, 64)
    o, d = generate_rays(pos, iv, ip, 64, 64)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    h_brute = brute.intersect_closest(scene, o, d, 0.0, 100.0)
    h_bvh = bvh_traverse.intersect_closest(scene, o, d, 0.0, 100.0)
    np.testing.assert_array_equal(np.asarray(h_brute.hit),
                                  np.asarray(h_bvh.hit))
    m = np.asarray(h_brute.hit)
    np.testing.assert_array_equal(np.asarray(h_brute.tri_id)[m],
                                  np.asarray(h_bvh.tri_id)[m])
    np.testing.assert_allclose(np.asarray(h_brute.t)[m],
                               np.asarray(h_bvh.t)[m], rtol=1e-5)
    # occlusion engines agree too
    b1 = brute.intersect_any(scene, o, d, 0.0, 100.0)
    b2 = bvh_traverse.intersect_any(scene, o, d, 0.0, 100.0)
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))


def test_shadowing(simple_scene):
    """A point under the sphere must be shadowed from the light above."""
    scene, _ = simple_scene
    from optixpathtracer_tpu.intersect import intersect_any
    o = jnp.array([[0.0, 0.01, 0.0]])   # on the floor, under the sphere
    light = jnp.array([0.0, 3.0, 0.0])
    d = (light - o) / jnp.linalg.norm(light - o)
    blocked = intersect_any(scene, o, d, 0.0, 3.0, method="brute")
    assert bool(blocked[0])
    # and a clear direction (straight up, from a corner away from the
    # sphere) is not blocked
    o2 = jnp.array([[2.0, 0.01, 2.0]])
    d2 = jnp.array([[0.0, 1.0, 0.0]])
    assert not bool(intersect_any(scene, o2, d2, 0.0, 100.0,
                                  method="brute")[0])


def test_deterministic(simple_scene):
    scene, camera = simple_scene
    a = np.asarray(render(scene, camera, 16, 16, spp=1, max_bounces=2,
                          intersect_method="brute"))
    b = np.asarray(render(scene, camera, 16, 16, spp=1, max_bounces=2,
                          intersect_method="brute"))
    np.testing.assert_array_equal(a, b)
