"""Preview window/input layer semantics (optixpathtracer_tpu/preview.py) -
the reference-parity behaviors of the GLFW callbacks it replaces
(`OptixView.cpp:12-31,48-85,141-151`): WASD moves along the camera basis,
drag rotates with the pitch clamped to +/-80 degrees, and any motion arms
the accumulator reset. Handler-level: a real HTTP server on an ephemeral
port, no render loop."""
import json
import urllib.request

import numpy as np
import pytest

from optixpathtracer_tpu.camera import Camera
from optixpathtracer_tpu.preview import (MOVE_SPEED, PITCH_LIMIT, ROT_SPEED,
                                         PreviewState, _make_handler)


@pytest.fixture()
def state():
    cam = Camera(position=np.array([1.0, 2.0, 3.0]),
                 rotation=np.array([0.0, 90.0, 0.0]))
    return PreviewState(cam)


def test_wasd_moves_along_camera_basis(state):
    cam = state.camera
    fwd = cam.forward()
    p0 = cam.position.copy()
    state.apply_input({"w"}, 0.0, 0.0, dt=0.5)
    np.testing.assert_allclose(cam.position - p0, fwd * MOVE_SPEED * 0.5,
                               atol=1e-9)
    assert state.moved  # motion arms the accumulator reset


def test_drag_rotates_and_clamps_pitch(state):
    cam = state.camera
    state.apply_input(set(), 40.0, 10.0, dt=0.05)
    assert cam.rotation[1] == pytest.approx(90.0 + 40.0 * ROT_SPEED)
    assert cam.rotation[0] == pytest.approx(10.0 * ROT_SPEED)
    # pitch clamp +/-80 (`OptixView.cpp:22-25`)
    state.apply_input(set(), 0.0, 1e6, dt=0.05)
    assert cam.rotation[0] == PITCH_LIMIT
    state.apply_input(set(), 0.0, -1e7, dt=0.05)
    assert cam.rotation[0] == -PITCH_LIMIT


def test_no_input_no_motion_flag(state):
    state.apply_input(set(), 0.0, 0.0, dt=0.05)
    assert not state.moved


@pytest.fixture()
def server(state):
    from http.server import ThreadingHTTPServer
    import threading
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(state, 64))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", srv
    srv.shutdown()


def test_http_input_round_trip(state, server):
    base, _ = server
    p0 = state.camera.position.copy()
    body = json.dumps({"keys": ["w"], "dx": 8.0, "dy": 0.0}).encode()
    req = urllib.request.Request(base + "/input", data=body, method="POST")
    with urllib.request.urlopen(req, timeout=5) as resp:
        assert resp.status == 200
    assert state.moved
    assert not np.allclose(state.camera.position, p0)
    assert state.camera.rotation[1] != 90.0

    # /state reflects the shared sample counter
    state.samples = 12
    with urllib.request.urlopen(base + "/state", timeout=5) as resp:
        s = json.loads(resp.read())
    assert s["samples"] == 12

    # /frame.png serves whatever the render loop last published
    state.png = b"\x89PNG-fake"
    with urllib.request.urlopen(base + "/frame.png", timeout=5) as resp:
        assert resp.read() == b"\x89PNG-fake"


def test_http_rejects_foreign_host(state, server):
    base, _ = server
    body = json.dumps({"keys": ["w"]}).encode()
    req = urllib.request.Request(base + "/input", data=body, method="POST",
                                 headers={"Host": "evil.example"})
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=5)
    assert exc.value.code == 403
    assert not state.moved
