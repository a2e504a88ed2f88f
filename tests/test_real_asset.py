"""Real-asset ingestion: a binary .glb exercising the loader features the
synthetic round-trip test (test_gltf.py) never touches - the shape of assets
exported by DCC tools (Blender/Sponza-class), per the reference loader's
domain (`ModelLoader.cpp:20-164`):

  * .glb binary container (JSON + BIN chunks)
  * a node HIERARCHY (root TRS -> child TRS -> mesh) whose transforms must
    compose (the reference never recursed, `ModelLoader.cpp:97-164`; ours
    fixes that)
  * INTERLEAVED vertex attributes (one bufferView, byteStride 32:
    POSITION+NORMAL+TEXCOORD_0)
  * uint16 indices (`ModelLoader.cpp:145-147`)
  * an embedded PNG texture referenced through a bufferView, with an alpha
    channel driving the cutout path (`devicePrograms.cu:518-561`)

The asset is built byte-by-byte here (struct + PIL PNG encode), NOT with the
repo's own writer, so the test cannot inherit the writer's conventions.
"""
import io
import json
import struct

import numpy as np
import pytest

from optixpathtracer_tpu.scene.gltf import load_gltf
from optixpathtracer_tpu.scene import PointLight, flatten_model


def _png_bytes(rgba: np.ndarray) -> bytes:
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(rgba, "RGBA").save(buf, format="PNG")
    return buf.getvalue()


def _align4(b: bytes, pad: bytes = b"\x00") -> bytes:
    return b + pad * (-len(b) % 4)


def build_glb(path: str) -> None:
    """Two-mesh scene: an opaque floor quad, and a 'leaf' quad carried by a
    root->child node chain, textured with a half-transparent checkerboard."""
    # --- interleaved vertex block for the leaf quad (P3 N3 UV2, stride 32)
    quad_pos = np.array([[-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1]],
                        np.float32)
    quad_nrm = np.tile(np.array([[0, 1, 0]], np.float32), (4, 1))
    quad_uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    inter = np.concatenate([quad_pos, quad_nrm, quad_uv],
                           axis=1).astype(np.float32)  # [4, 8]
    inter_bytes = inter.tobytes()

    idx = np.array([0, 1, 2, 0, 2, 3], np.uint16)
    idx_bytes = _align4(idx.tobytes())

    # floor: tightly-packed separate accessor (mixed layouts in one asset),
    # NON-indexed (6 verts = 2 tris), no UVs
    floor_pos = np.array([[-4, 0, -4], [4, 0, -4], [4, 0, 4],
                          [-4, 0, -4], [4, 0, 4], [-4, 0, 4]], np.float32)
    floor_bytes = floor_pos.tobytes()

    # 8x8 checkerboard texture: alpha alternates 1.0 / 0.0 per texel
    tex = np.zeros((8, 8, 4), np.uint8)
    tex[..., :3] = 220
    checker = (np.add.outer(np.arange(8), np.arange(8)) % 2).astype(bool)
    tex[..., 3] = np.where(checker, 255, 0)
    png = _align4(_png_bytes(tex))

    bin_chunk = inter_bytes + idx_bytes + floor_bytes + png
    views = [
        {"buffer": 0, "byteOffset": 0, "byteLength": len(inter_bytes),
         "byteStride": 32, "target": 34962},
        {"buffer": 0, "byteOffset": len(inter_bytes),
         "byteLength": len(idx.tobytes()), "target": 34963},
        {"buffer": 0, "byteOffset": len(inter_bytes) + len(idx_bytes),
         "byteLength": len(floor_bytes), "target": 34962},
        {"buffer": 0,
         "byteOffset": len(inter_bytes) + len(idx_bytes) + len(floor_bytes),
         "byteLength": len(png)},
    ]
    accessors = [
        # interleaved: same view, different byteOffsets
        {"bufferView": 0, "byteOffset": 0, "componentType": 5126,
         "count": 4, "type": "VEC3", "min": [-1, 0, -1], "max": [1, 0, 1]},
        {"bufferView": 0, "byteOffset": 12, "componentType": 5126,
         "count": 4, "type": "VEC3"},
        {"bufferView": 0, "byteOffset": 24, "componentType": 5126,
         "count": 4, "type": "VEC2"},
        {"bufferView": 1, "componentType": 5123, "count": 6,
         "type": "SCALAR"},
        {"bufferView": 2, "componentType": 5126, "count": 6, "type": "VEC3"},
    ]
    doc = {
        "asset": {"version": "2.0", "generator": "hand-rolled test asset"},
        "scene": 0,
        "scenes": [{"nodes": [0, 3]}],
        "nodes": [
            # root: +2 in y, child chain carries the leaf quad
            {"name": "root", "translation": [0, 2, 0], "children": [1]},
            # child: scale 0.5 then its own child
            {"name": "mid", "scale": [0.5, 0.5, 0.5], "children": [2]},
            # grandchild: +1 x offset, holds the mesh
            {"name": "leaf", "translation": [1, 0, 0], "mesh": 0},
            {"name": "floor", "mesh": 1},
        ],
        "meshes": [
            {"primitives": [{
                "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
                "indices": 3, "material": 0}]},
            {"primitives": [{"attributes": {"POSITION": 4}, "material": 1}]},
        ],
        "materials": [
            {"name": "leafmat", "alphaMode": "MASK",
             "pbrMetallicRoughness": {
                 "baseColorTexture": {"index": 0},
                 "metallicFactor": 0.0, "roughnessFactor": 1.0},
             "extras": {"mat_type": "diffuse"}},
            {"name": "floormat",
             "pbrMetallicRoughness": {
                 "baseColorFactor": [0.8, 0.8, 0.8, 1.0],
                 "metallicFactor": 0.0, "roughnessFactor": 1.0},
             "extras": {"mat_type": "diffuse"}},
        ],
        "textures": [{"source": 0}],
        "images": [{"bufferView": 3, "mimeType": "image/png"}],
        "accessors": accessors,
        "bufferViews": views,
        "buffers": [{"byteLength": len(bin_chunk)}],
    }
    json_chunk = _align4(json.dumps(doc).encode(), b" ")
    total = 12 + 8 + len(json_chunk) + 8 + len(bin_chunk)
    with open(path, "wb") as f:
        f.write(b"glTF" + struct.pack("<II", 2, total))
        f.write(struct.pack("<II", len(json_chunk), 0x4E4F534A))
        f.write(json_chunk)
        f.write(struct.pack("<II", len(bin_chunk), 0x004E4942))
        f.write(bin_chunk)


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("asset") / "leaf.glb")
    build_glb(path)
    return load_gltf(path)


def test_hierarchy_composes(model):
    """Leaf quad positions = root_T(0,2,0) o mid_S(0.5) o leaf_T(1,0,0) o P:
    quad corner (-1,0,-1) -> (0.5*(1-1), 2+0, 0.5*-1) = (0, 2, -0.5)."""
    names = [m.name for m in model.meshes]
    assert names == ["leaf", "floor"]
    leaf = model.meshes[0]
    expect = quadw = np.array(
        [[0.0, 2.0, -0.5], [1.0, 2.0, -0.5], [1.0, 2.0, 0.5],
         [0.0, 2.0, 0.5]], np.float32)
    np.testing.assert_allclose(leaf.positions, expect, atol=1e-6)
    # normals transform through inverse-transpose (uniform scale: unchanged)
    np.testing.assert_allclose(leaf.normals,
                               np.tile([[0, 1, 0]], (4, 1)), atol=1e-6)
    assert leaf.indices.dtype == np.int32 and leaf.indices.shape == (2, 3)


def test_interleaved_uv_and_texture(model):
    leaf = model.meshes[0]
    np.testing.assert_allclose(
        leaf.uvs, [[0, 0], [1, 0], [1, 1], [0, 1]], atol=1e-6)
    assert leaf.material.albedo_texture == 0
    assert len(model.textures) == 1
    tex = model.textures[0].pixels
    assert tex.shape == (8, 8, 4)
    # alpha checkerboard survived PNG encode->decode
    assert tex[0, 0, 3] == 0.0 and tex[0, 1, 3] == 1.0


def test_flatten_detects_cutout_and_renders(model):
    from optixpathtracer_tpu.integrate.cutout import scene_uses_alpha_cutout
    from optixpathtracer_tpu.integrate import render
    from optixpathtracer_tpu.camera import Camera

    lights = [PointLight(np.array([0.5, 5.0, 0.0]), np.ones(3) * 20.0)]
    scene = flatten_model(model, lights)
    assert scene_uses_alpha_cutout(scene)
    assert int(np.asarray(scene.tri_valid).sum()) == 4  # 2 quads

    cam = Camera(position=np.array([0.5, 4.0, 2.5]),
                 rotation=np.array([55.0, 180.0, 0.0]))
    img = np.asarray(render(scene, cam, 32, 32, spp=2, max_bounces=2))
    assert np.isfinite(img).all() and img.max() > 0.0

    # cutout must change the image vs forcing the leaf opaque: transparent
    # texels pass light through to the floor below
    img_opaque = np.asarray(render(scene, cam, 32, 32, spp=2, max_bounces=2,
                                   use_alpha_cutout=False))
    assert np.abs(img - img_opaque).max() > 1e-3


# ---------------------------------------------------------------------------
# Sponza-class scale: a >=100k-vertex interleaved textured .glb must load in
# interactive time (the round-4 per-vertex accessor loop took minutes here;
# the strided view takes milliseconds). Reference domain: the Sponza scenes
# `main.cpp:21-45` through `ModelLoader.cpp`.
# ---------------------------------------------------------------------------

def build_big_glb(path: str, n: int = 316) -> None:
    """Terrain grid: (n+1)^2 interleaved P3N3UV2 vertices (stride 32),
    2*n^2 uint32-indexed triangles, one embedded opaque PNG texture.
    n=316 -> 100,489 vertices / 199,712 triangles."""
    xs = np.linspace(-5.0, 5.0, n + 1, dtype=np.float32)
    gx, gz = np.meshgrid(xs, xs, indexing="ij")
    gy = (np.sin(gx) * np.cos(gz) * 0.3).astype(np.float32)
    pos = np.stack([gx, gy, gz], -1).reshape(-1, 3)
    nrm = np.tile(np.array([[0, 1, 0]], np.float32), (len(pos), 1))
    uv = np.stack([(gx + 5) / 10, (gz + 5) / 10], -1).reshape(-1, 2)
    inter = np.concatenate([pos, nrm, uv], 1).astype(np.float32)  # [V, 8]
    inter_bytes = inter.tobytes()

    ii = (np.arange(n)[:, None] * (n + 1) + np.arange(n)[None, :])
    quads = np.stack([ii, ii + 1, ii + n + 2, ii, ii + n + 2, ii + n + 1],
                     -1).reshape(-1).astype(np.uint32)
    idx_bytes = _align4(quads.tobytes())

    tex = np.full((16, 16, 4), 200, np.uint8)
    tex[..., 3] = 255
    png = _align4(_png_bytes(tex))

    bin_chunk = inter_bytes + idx_bytes + png
    views = [
        {"buffer": 0, "byteOffset": 0, "byteLength": len(inter_bytes),
         "byteStride": 32, "target": 34962},
        {"buffer": 0, "byteOffset": len(inter_bytes),
         "byteLength": len(quads.tobytes()), "target": 34963},
        {"buffer": 0, "byteOffset": len(inter_bytes) + len(idx_bytes),
         "byteLength": len(png)},
    ]
    accessors = [
        {"bufferView": 0, "byteOffset": 0, "componentType": 5126,
         "count": len(pos), "type": "VEC3",
         "min": [-5.0, -0.3, -5.0], "max": [5.0, 0.3, 5.0]},
        {"bufferView": 0, "byteOffset": 12, "componentType": 5126,
         "count": len(pos), "type": "VEC3"},
        {"bufferView": 0, "byteOffset": 24, "componentType": 5126,
         "count": len(pos), "type": "VEC2"},
        {"bufferView": 1, "componentType": 5125, "count": len(quads),
         "type": "SCALAR"},
    ]
    doc = {
        "asset": {"version": "2.0", "generator": "hand-rolled scale asset"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"name": "terrain", "mesh": 0}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
            "indices": 3, "material": 0}]}],
        "materials": [{"name": "ground", "pbrMetallicRoughness": {
            "baseColorTexture": {"index": 0},
            "metallicFactor": 0.0, "roughnessFactor": 1.0},
            "extras": {"mat_type": "diffuse"}}],
        "textures": [{"source": 0}],
        "images": [{"bufferView": 2, "mimeType": "image/png"}],
        "accessors": accessors,
        "bufferViews": views,
        "buffers": [{"byteLength": len(bin_chunk)}],
    }
    json_chunk = _align4(json.dumps(doc).encode(), b" ")
    total = 12 + 8 + len(json_chunk) + 8 + len(bin_chunk)
    with open(path, "wb") as f:
        f.write(b"glTF" + struct.pack("<II", 2, total))
        f.write(struct.pack("<II", len(json_chunk), 0x4E4F534A))
        f.write(json_chunk)
        f.write(struct.pack("<II", len(bin_chunk), 0x004E4942))
        f.write(bin_chunk)


def test_sponza_scale_interleaved_load_and_render(tmp_path):
    import time

    path = str(tmp_path / "terrain.glb")
    build_big_glb(path)

    t0 = time.time()
    big = load_gltf(path)
    load_s = time.time() - t0
    mesh = big.meshes[0]
    assert len(mesh.positions) == 100489
    assert mesh.indices.shape == (199712, 3)
    # interleaved accessors decoded correctly: spot-check first/last verts
    np.testing.assert_allclose(mesh.positions[0], [-5.0, np.sin(-5.0)
                               * np.cos(-5.0) * 0.3, -5.0], atol=1e-6)
    np.testing.assert_allclose(mesh.uvs[-1], [1.0, 1.0], atol=1e-6)
    # the load-time bar from VERDICT r4 item 6 (was minutes pre-vectorize)
    assert load_s < 1.0, f"interleaved load took {load_s:.2f}s"

    lights = [PointLight(np.array([0.0, 6.0, 0.0]), np.ones(3) * 40.0)]
    scene = flatten_model(big, lights)
    assert int(np.asarray(scene.tri_valid).sum()) == 199712

    from optixpathtracer_tpu.integrate import render
    from optixpathtracer_tpu.camera import Camera
    cam = Camera(position=np.array([0.0, 4.0, 6.0]),
                 rotation=np.array([60.0, 180.0, 0.0]))
    img = np.asarray(render(scene, cam, 16, 16, spp=1, max_bounces=2))
    assert np.isfinite(img).all() and img.max() > 0.0
