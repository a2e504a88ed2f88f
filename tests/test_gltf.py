"""glTF loader tests: writer->loader round-trip (the reference ships no
assets, so our writer generates the fixtures), plus format-gap coverage."""
import json

import numpy as np
import pytest

from optixpathtracer_tpu.scene import flatten_model
from optixpathtracer_tpu.scene.gltf import load_gltf, save_gltf
from optixpathtracer_tpu.scene.procedural import PRESETS, uv_sphere
from optixpathtracer_tpu.scene.types import Material, Mesh, Model


def test_roundtrip_sphere(tmp_path):
    mesh = uv_sphere(0.5, (1.0, 2.0, 3.0), 8, 16,
                     Material(base_color=np.array([0.8, 0.2, 0.1],
                                                  np.float32),
                              metallic=0.7, roughness=0.3,
                              mat_type="conductor"))
    p = str(tmp_path / "sphere.gltf")
    save_gltf(p, Model(meshes=[mesh]))
    back = load_gltf(p)
    assert len(back.meshes) == 1
    m = back.meshes[0]
    np.testing.assert_allclose(m.positions, mesh.positions, atol=1e-5)
    np.testing.assert_allclose(m.normals, mesh.normals, atol=1e-5)
    np.testing.assert_array_equal(m.indices.reshape(-1),
                                  mesh.indices.reshape(-1))
    assert m.material.mat_type == "conductor"
    assert m.material.metallic == pytest.approx(0.7)
    np.testing.assert_allclose(m.material.base_color, [0.8, 0.2, 0.1],
                               atol=1e-6)


def test_roundtrip_preset_scene_flattens(tmp_path):
    model, _, lights = PRESETS["scene3_cornell"]()
    p = str(tmp_path / "cornell.gltf")
    save_gltf(p, model)
    back = load_gltf(p)
    assert len(back.meshes) == len(model.meshes)
    scene_a = flatten_model(model, lights)
    scene_b = flatten_model(back, lights)
    assert scene_a.tri_v0.shape == scene_b.tri_v0.shape
    np.testing.assert_allclose(np.asarray(scene_a.tri_v0),
                               np.asarray(scene_b.tri_v0), atol=1e-4)


def test_child_node_recursion(tmp_path):
    """The reference never recursed into node children
    (`ModelLoader.cpp:97-164`); we must, with composed transforms."""
    mesh = uv_sphere(1.0, (0, 0, 0), 6, 12)
    p = str(tmp_path / "nested.gltf")
    save_gltf(p, Model(meshes=[mesh]))
    doc = json.load(open(p))
    # wrap the mesh node in a parent that translates by (5, 0, 0)
    doc["nodes"] = [
        {"name": "parent", "translation": [5.0, 0.0, 0.0], "children": [1]},
        doc["nodes"][0],
    ]
    doc["scenes"][0]["nodes"] = [0]
    json.dump(doc, open(p, "w"))

    back = load_gltf(p)
    assert len(back.meshes) == 1
    center = back.meshes[0].positions.mean(axis=0)
    np.testing.assert_allclose(center, [5.0, 0.0, 0.0], atol=0.05)

    # reference_compat skips children entirely
    compat = load_gltf(p, reference_compat=True)
    assert len(compat.meshes) == 0


def test_uint16_and_uint32_indices(tmp_path):
    """Reference assumed uint16 (`ModelLoader.cpp:145-147`); we handle all."""
    mesh = Mesh(
        positions=np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32),
        indices=np.array([[0, 1, 2]], np.int32))
    p = str(tmp_path / "tri.gltf")
    save_gltf(p, Model(meshes=[mesh]))
    # our writer emits uint32; patch a copy to uint16 to cover that path
    back32 = load_gltf(p)
    assert back32.meshes[0].indices.shape == (1, 3)

    doc = json.load(open(p))
    import base64
    blob = bytearray(base64.b64decode(
        doc["buffers"][0]["uri"].split(",", 1)[1]))
    # find the index accessor and rewrite as uint16
    for acc in doc["accessors"]:
        if acc["type"] == "SCALAR":
            view = doc["bufferViews"][acc["bufferView"]]
            idx = np.frombuffer(bytes(blob), np.uint32, acc["count"],
                                view["byteOffset"])
            new = idx.astype(np.uint16).tobytes()
            blob[view["byteOffset"]:view["byteOffset"] + len(new)] = new
            view["byteLength"] = len(new)
            acc["componentType"] = 5123
    doc["buffers"][0]["uri"] = ("data:application/octet-stream;base64,"
                                + base64.b64encode(bytes(blob)).decode())
    json.dump(doc, open(p, "w"))
    back16 = load_gltf(p)
    np.testing.assert_array_equal(back16.meshes[0].indices,
                                  back32.meshes[0].indices)
