"""Image-regression tests against committed goldens (SURVEY.md section 4
rung 3). The reference validated against PBRT renders of scenes whose assets
it never shipped; our goldens are this framework's own deterministic CPU
renders at fixed seeds - any unintended change to sampling, shading, or
intersection shifts the image and fails exactly.

Regenerate (after an INTENTIONAL image-changing fix) with:
    python tests/test_golden.py --regen
"""
import os
import sys

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")

CASES = {
    # name: (preset, width, height, spp, max_bounces)
    "cornell": ("scene3_cornell", 48, 48, 2, 2),
    "conductor": ("conductor", 48, 48, 2, 2),
    "dielectric": ("dielectric", 48, 48, 2, 2),
    "layered": ("layered", 32, 32, 1, 2),
}


def _render_case(name):
    from optixpathtracer_tpu.integrate import render
    from optixpathtracer_tpu.scene import flatten_model
    from optixpathtracer_tpu.scene.procedural import PRESETS
    preset, w, h, spp, bounces = CASES[name]
    model, camera, lights = PRESETS[preset]()
    scene = flatten_model(model, lights)
    img = render(scene, camera, w, h, spp=spp, max_bounces=bounces,
                 intersect_method="brute")
    return np.asarray(img)


@pytest.mark.parametrize("name", sorted(CASES))
def test_golden(name):
    from optixpathtracer_tpu.film import read_exr
    path = os.path.join(GOLDEN_DIR, f"{name}.exr")
    if not os.path.exists(path):
        pytest.skip(f"golden {path} not generated yet (run --regen)")
    img = _render_case(name)
    golden = read_exr(path)
    assert img.shape == golden.shape
    # bit-exact on the same backend; tiny tolerance for cross-version drift
    np.testing.assert_allclose(img, golden, atol=2e-5, rtol=1e-4)


if __name__ == "__main__":
    if "--regen" in sys.argv:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
        from optixpathtracer_tpu.film import write_exr
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        for name in sorted(CASES):
            img = _render_case(name)
            write_exr(os.path.join(GOLDEN_DIR, f"{name}.exr"), img)
            print(f"regenerated {name}: mean={img.mean():.5f}")
    else:
        print(__doc__)
