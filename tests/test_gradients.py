"""Gradient checks (SURVEY.md section 4 new obligations / BASELINE.md):
analytic pixel gradients vs finite differences, plus BSDF-level parameter
derivatives."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optixpathtracer_tpu.bsdf import conductor, dielectric
from optixpathtracer_tpu.core import math as cm
from optixpathtracer_tpu.diff import (finite_difference, param_gradients,
                                      render_loss_fn)
from optixpathtracer_tpu.scene import flatten_model
from optixpathtracer_tpu.scene.procedural import PRESETS


@pytest.fixture(scope="module")
def cornell_setup():
    model, camera, lights = PRESETS["scene3_cornell"]()
    scene = flatten_model(model, lights)
    cam_params = camera.raygen_params(16, 16)
    return scene, cam_params


class TestImageGradients:
    def test_albedo_gradient_matches_fd(self, cornell_setup):
        """Albedo never steers sampling in the diffuse path, so the
        detached analytic gradient == same-seed finite differences."""
        scene, cam_params = cornell_setup
        frames = [0]
        grads = param_gradients(scene, cam_params, 16, 16, frames,
                                fields=("mat_albedo",), max_bounces=1)
        g = np.asarray(grads["mat_albedo"])
        assert np.isfinite(g).all()
        assert np.abs(g).max() > 0.0

        # check the largest-gradient entry against FD
        idx = np.unravel_index(np.abs(g).argmax(), g.shape)
        fd = finite_difference(scene, cam_params, 16, 16, frames,
                               "mat_albedo", idx, h=1e-2, max_bounces=1)
        np.testing.assert_allclose(g[idx], fd, rtol=5e-2, atol=1e-5)

    def test_light_color_gradient_matches_fd(self, cornell_setup):
        """Radiance is linear in light color -> gradient exact."""
        scene, cam_params = cornell_setup
        frames = [0]
        grads = param_gradients(scene, cam_params, 16, 16, frames,
                                fields=("light_color",), max_bounces=1)
        g = np.asarray(grads["light_color"])
        assert np.abs(g).max() > 0.0
        idx = np.unravel_index(np.abs(g).argmax(), g.shape)
        fd = finite_difference(scene, cam_params, 16, 16, frames,
                               "light_color", idx, h=1e-2, max_bounces=1)
        np.testing.assert_allclose(g[idx], fd, rtol=2e-2, atol=1e-6)

    def test_roughness_ior_gradients_finite(self, cornell_setup):
        scene, cam_params = cornell_setup
        grads = param_gradients(scene, cam_params, 16, 16, [0],
                                fields=("mat_roughness", "mat_ior"),
                                max_bounces=1)
        assert np.isfinite(np.asarray(grads["mat_roughness"])).all()
        assert np.isfinite(np.asarray(grads["mat_ior"])).all()

    def test_multibounce_gradients_finite(self):
        """Reverse-mode through the multi-bounce path: exactly what the
        safe_sqrt/fresnel_dielectric NaN guards protect (grazing TIR on
        secondary bounces). 8x8 at max_bounces=2 on a dielectric+layered
        scene locks in the NaN-guard behavior cheaply."""
        model, camera, lights = PRESETS["dielectric"]()
        scene = flatten_model(model, lights)
        cam_params = camera.raygen_params(8, 8)
        grads = param_gradients(scene, cam_params, 8, 8, [0],
                                fields=("mat_roughness", "mat_ior",
                                        "mat_albedo"),
                                max_bounces=2)
        for field, g in grads.items():
            g = np.asarray(g)
            assert np.isfinite(g).all(), field
        assert np.abs(np.asarray(grads["mat_albedo"])).max() > 0.0


class TestBSDFParameterDerivatives:
    """Deterministic derivative checks at the BSDF-eval level (no sampling
    noise): d f / d roughness and d f / d ior vs finite differences."""

    def test_conductor_roughness_derivative(self):
        wo = cm.normalize(jnp.array([0.3, 0.1, 0.9]))[None]
        wi = cm.normalize(jnp.array([-0.2, 0.2, 0.95]))[None]
        alb = jnp.full((1, 3), 0.9)

        def f_of_r(r):
            return conductor.f(alb, jnp.full((1,), r), wo, wi)[0, 0]

        r0 = 0.5
        g = jax.grad(f_of_r)(r0)
        h = 1e-3
        fd = (f_of_r(r0 + h) - f_of_r(r0 - h)) / (2 * h)
        np.testing.assert_allclose(g, fd, rtol=1e-2)
        assert abs(float(g)) > 1e-4

    def test_dielectric_ior_derivative(self):
        wo = cm.normalize(jnp.array([0.4, 0.0, 0.8]))[None]
        wi = cm.normalize(jnp.array([-0.35, 0.1, 0.85]))[None]

        def f_of_eta(eta):
            return dielectric.f(jnp.full((1,), 0.6), wo, wi,
                                eta=jnp.full((1,), eta))[0, 0]

        e0 = 1.5
        g = jax.grad(f_of_eta)(e0)
        h = 1e-3
        fd = (f_of_eta(e0 + h) - f_of_eta(e0 - h)) / (2 * h)
        np.testing.assert_allclose(g, fd, rtol=1e-2)

    def test_dielectric_roughness_derivative(self):
        wo = cm.normalize(jnp.array([0.4, 0.0, 0.8]))[None]
        wi = cm.normalize(jnp.array([-0.35, 0.1, 0.85]))[None]

        def f_of_r(r):
            return dielectric.f(jnp.full((1,), r), wo, wi)[0, 0]

        g = jax.grad(f_of_r)(0.6)
        fd = (f_of_r(0.6 + 1e-3) - f_of_r(0.6 - 1e-3)) / 2e-3
        np.testing.assert_allclose(g, fd, rtol=1e-2)


class TestInverseRendering:
    def test_albedo_recovery_step_descends(self, cornell_setup):
        """One SGD step on albedo toward a darker target must reduce the
        L2 loss - the end-to-end 'gradients are useful' check."""
        scene, cam_params = cornell_setup

        from optixpathtracer_tpu.integrate.path import render_sample
        pos, iv, ip = cam_params
        # 1 bounce / 1 frame: same gradient structure, fraction of the
        # CPU compile time of the full-depth program.
        target = 0.5 * render_sample(scene, pos, iv, ip, 16, 16,
                                     jnp.uint32(0), max_bounces=1)

        def l2(params):
            s = scene._replace(**params)
            img = render_sample(s, pos, iv, ip, 16, 16, jnp.uint32(0),
                                max_bounces=1)
            return jnp.mean((img - target) ** 2)

        params = {"mat_albedo": scene.mat_albedo}
        l0, g = jax.value_and_grad(l2)(params)
        params1 = {"mat_albedo": jnp.clip(
            params["mat_albedo"] - 2.0 * g["mat_albedo"], 0.0, 1.0)}
        l1 = l2(params1)
        assert float(l1) < float(l0)
