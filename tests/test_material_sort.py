"""Material-sorted shading (integrate/path.py material_sort): the sorted +
runtime-gated path must agree statistically with the dense dispatch (it is
unbiased but not bit-identical - skipped lobes do not advance the RNG
streams they would have burnt, see bsdf/dispatch._gated)."""
import numpy as np
import pytest

from optixpathtracer_tpu.camera import Camera
from optixpathtracer_tpu.integrate.path import render_sample
from optixpathtracer_tpu.scene import (Material, Model, PointLight,
                                       flatten_model)
from optixpathtracer_tpu.scene.flatten import scene_active_lobes
from optixpathtracer_tpu.scene.procedural import quad, uv_sphere


@pytest.fixture(scope="module")
def multi_mat_scene():
    mats = [
        Material(base_color=np.array([0.7, 0.3, 0.2], np.float32),
                 mat_type="diffuse"),
        Material(base_color=np.array([0.9, 0.7, 0.4], np.float32),
                 metallic=1.0, roughness=0.3, mat_type="conductor"),
        Material(base_color=np.ones(3, np.float32), roughness=0.0,
                 mat_type="dielectric"),
        Material(base_color=np.array([0.2, 0.4, 0.7], np.float32),
                 roughness=0.2, mat_type="glossy_diffuse"),
    ]
    meshes = [quad((-4, 0, -4), (0, 0, 8), (8, 0, 0),
                   Material(base_color=np.full(3, 0.6, np.float32),
                            mat_type="diffuse"), "floor")]
    for i, m in enumerate(mats):
        meshes.append(uv_sphere(0.5, (i * 1.4 - 2.1, 0.6, 0.0), 8, 16, m,
                                name=f"s{i}"))
    scene = flatten_model(Model(meshes=meshes),
                          [PointLight(np.array([0.0, 5.0, 2.0]),
                                      np.full(3, 30.0))])
    cam = Camera(position=np.array([0.0, 1.5, 4.0]),
                 rotation=np.array([12.0, 180.0, 0.0]))
    return scene, cam


@pytest.mark.parametrize("n_seg", [4])  # one segment count: each extra
                                        # value compiles a whole render
                                        # graph (~6 min CPU)
def test_material_sort_matches_dense_statistically(multi_mat_scene, n_seg):
    scene, cam = multi_mat_scene
    lobes = scene_active_lobes(scene)
    w = h = 32
    pos, iv, ip = cam.raygen_params(w, h)
    import jax.numpy as jnp
    spp = 8
    a0 = np.zeros((h, w, 3))
    a1 = np.zeros((h, w, 3))
    for s in range(spp):
        a0 += np.asarray(render_sample(scene, pos, iv, ip, w, h,
                                       jnp.uint32(s), 2,
                                       active_lobes=lobes,
                                       use_textures=False))
        a1 += np.asarray(render_sample(scene, pos, iv, ip, w, h,
                                       jnp.uint32(s), 2,
                                       active_lobes=lobes,
                                       use_textures=False,
                                       material_sort=n_seg))
    a0 /= spp
    a1 /= spp
    assert np.isfinite(a1).all()
    # same estimator, decorrelated samples: means agree within MC noise
    assert abs(a1.mean() - a0.mean()) / a0.mean() < 0.05
    # and images correlate strongly pixelwise
    corr = np.corrcoef(a0.ravel(), a1.ravel())[0, 1]
    assert corr > 0.98
