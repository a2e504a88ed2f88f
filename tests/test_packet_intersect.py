"""Packet-sweep kernel (intersect/packet_kernels.py) vs the brute-force
oracle, in Pallas interpret mode on CPU (same harness as
test_walk_intersect.py). The driver exercises the compiled path on real
TPU via benchmarks/tri_scaling.py."""
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from optixpathtracer_tpu.intersect import brute, packet_kernels

from test_walk_intersect import _make


@pytest.fixture(scope="module")
def scene_and_rays():
    return _make()


def test_closest_matches_oracle(scene_and_rays):
    scene, o, d = scene_and_rays
    expect = brute.intersect_closest(scene, o, d, 0.0, 100.0)
    with pltpu.force_tpu_interpret_mode():
        got = packet_kernels.intersect_closest(scene, o, d, 0.0, 100.0)
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
        got = packet_kernels.intersect_any(scene, o, d, 0.0, 100.0)
    np.testing.assert_array_equal(np.asarray(expect), np.asarray(got))


def test_tmax_respected(scene_and_rays):
    scene, o, d = scene_and_rays
    with pltpu.force_tpu_interpret_mode():
        near = packet_kernels.intersect_closest(scene, o, d, 0.0, 4.0)
        far = packet_kernels.intersect_closest(scene, o, d, 0.0, 100.0)
    assert (np.asarray(near.hit) <= np.asarray(far.hit)).all()
    got_t = np.asarray(near.t)[np.asarray(near.hit)]
    assert (got_t <= 4.0 + 1e-5).all()


def test_api_packet_method(scene_and_rays):
    from optixpathtracer_tpu.intersect import intersect_closest
    scene, o, d = scene_and_rays
    with pltpu.force_tpu_interpret_mode():
        got = intersect_closest(scene, o, d, method="packet")
    expect = brute.intersect_closest(scene, o, d, 0.0, 100.0)
    m = np.asarray(expect.hit)
    np.testing.assert_array_equal(m, np.asarray(got.hit))
    np.testing.assert_allclose(np.asarray(expect.u)[m],
                               np.asarray(got.u)[m], atol=1e-4)
