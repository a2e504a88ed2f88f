"""Unit tests for the core math/RNG layer (SURVEY.md section 4 rung 1:
pure-function tests of spherical geometry / microfacet / Fresnel identities,
modeled on reference `UnitTests/SpherGeom_Test.cpp`)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optixpathtracer_tpu.core import fresnel, math as cm, microfacet, rng


def _rand_unit(key, n):
    v = jax.random.normal(key, (n, 3))
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


class TestSphericalGeometry:
    def test_cos_theta_is_z(self):
        # reference SpherGeom_Test.cpp:17-22
        w = jnp.array([[0.3, 0.4, 0.5], [0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
        np.testing.assert_allclose(cm.cos_theta(w), w[:, 2])

    def test_pythagoras(self):
        w = _rand_unit(jax.random.PRNGKey(0), 64)
        np.testing.assert_allclose(
            cm.cos2_theta(w) + cm.sin2_theta(w), 1.0, atol=1e-5)

    def test_phi_decomposition(self):
        w = _rand_unit(jax.random.PRNGKey(1), 64)
        st = cm.sin_theta(w)
        np.testing.assert_allclose(cm.cos_phi(w) * st, w[:, 0], atol=1e-5)
        np.testing.assert_allclose(cm.sin_phi(w) * st, w[:, 1], atol=1e-5)

    def test_tan2_theta_inf_at_horizon(self):
        w = jnp.array([[1.0, 0.0, 0.0]])
        assert jnp.isinf(cm.tan2_theta(w))[0]

    def test_same_hemisphere(self):
        a = jnp.array([[0.0, 0.0, 1.0]])
        b = jnp.array([[0.1, 0.1, 0.5]])
        c = jnp.array([[0.1, 0.1, -0.5]])
        assert bool(cm.same_hemisphere(a, b)[0])
        assert not bool(cm.same_hemisphere(a, c)[0])

    def test_coordinate_system_orthonormal(self):
        v1 = _rand_unit(jax.random.PRNGKey(2), 128)
        v2, v3 = cm.coordinate_system(v1)
        np.testing.assert_allclose(cm.dot(v1, v2), 0.0, atol=1e-5)
        np.testing.assert_allclose(cm.dot(v1, v3), 0.0, atol=1e-5)
        np.testing.assert_allclose(cm.dot(v2, v3), 0.0, atol=1e-5)
        np.testing.assert_allclose(cm.length(v2), 1.0, atol=1e-5)
        np.testing.assert_allclose(cm.length(v3), 1.0, atol=1e-5)

    def test_build_tangent_space_orthonormal(self):
        n = _rand_unit(jax.random.PRNGKey(3), 128)
        t, b = cm.build_tangent_space(n)
        np.testing.assert_allclose(cm.dot(t, n), 0.0, atol=1e-5)
        np.testing.assert_allclose(cm.dot(b, n), 0.0, atol=2e-5)
        np.testing.assert_allclose(cm.length(t), 1.0, atol=1e-5)
        np.testing.assert_allclose(cm.length(b), 1.0, atol=1e-5)

    def test_local_world_roundtrip(self):
        key = jax.random.PRNGKey(4)
        n = _rand_unit(key, 32)
        t, b = cm.build_tangent_space(n)
        v = _rand_unit(jax.random.PRNGKey(5), 32)
        v_local = cm.to_local(t, b, n, v)
        v_back = cm.to_world(t, b, n, v_local)
        np.testing.assert_allclose(v_back, v, atol=1e-5)
        # normal maps to +z
        n_local = cm.to_local(t, b, n, n)
        np.testing.assert_allclose(
            n_local, jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (32, 1)),
            atol=2e-5)

    def test_reflect(self):
        wo = jnp.array([[0.5, 0.0, jnp.sqrt(0.75)]])
        n = jnp.array([[0.0, 0.0, 1.0]])
        wi = cm.reflect(wo, n)
        np.testing.assert_allclose(
            wi, jnp.array([[-0.5, 0.0, jnp.sqrt(0.75)]]), atol=1e-6)


class TestRNG:
    def test_tea_matches_known_structure(self):
        # TEA is deterministic; same inputs -> same output, diff inputs differ
        a = rng.tea(jnp.uint32(1), jnp.uint32(2))
        b = rng.tea(jnp.uint32(1), jnp.uint32(2))
        c = rng.tea(jnp.uint32(2), jnp.uint32(1))
        assert int(a) == int(b)
        assert int(a) != int(c)

    def test_lcg_reference_constants(self):
        # one step of seed 0: 1664525*0 + 1013904223
        new, bits = rng.lcg(jnp.uint32(0))
        assert int(new) == 1013904223
        assert int(bits) == 1013904223 & 0x00FFFFFF

    def test_rnd_range_and_uniformity(self):
        seed = rng.tea(jnp.arange(4096, dtype=jnp.uint32), jnp.uint32(7))
        seed, u1 = rng.rnd(seed)
        seed, u2 = rng.rnd(seed)
        u = jnp.concatenate([u1, u2])
        assert float(u.min()) >= 0.0 and float(u.max()) < 1.0
        assert abs(float(u.mean()) - 0.5) < 0.02
        assert abs(float(jnp.var(u)) - 1.0 / 12.0) < 0.005

    def test_cosine_hemisphere_distribution(self):
        seed = rng.tea(jnp.arange(8192, dtype=jnp.uint32), jnp.uint32(3))
        _, w = rng.sample_cosine_hemisphere(seed)
        assert float(w[:, 2].min()) >= 0.0
        # E[cos theta] = 2/3 for pdf = cos/pi
        assert abs(float(w[:, 2].mean()) - 2.0 / 3.0) < 0.02
        np.testing.assert_allclose(
            np.asarray(cm.length(w)), 1.0, atol=1e-4)

    def test_disk_polar_radius(self):
        seed = rng.tea(jnp.arange(8192, dtype=jnp.uint32), jnp.uint32(9))
        _, p = rng.sample_uniform_disk_polar(seed)
        r = jnp.sqrt(p[:, 0] ** 2 + p[:, 1] ** 2)
        assert float(r.max()) <= 1.0
        # E[r] = 2/3 for uniform disk
        assert abs(float(r.mean()) - 2.0 / 3.0) < 0.02


class TestFresnel:
    def test_dielectric_normal_incidence(self):
        # R0 = ((n-1)/(n+1))^2 = 0.04 for n = 1.5
        r = fresnel.fresnel_dielectric(jnp.array(1.0), 1.5)
        np.testing.assert_allclose(r, 0.04, atol=1e-6)

    def test_dielectric_grazing_is_one(self):
        r = fresnel.fresnel_dielectric(jnp.array(1e-5), 1.5)
        assert float(r) > 0.99

    def test_dielectric_tir(self):
        # from inside (cos<0 flips), beyond critical angle -> 1
        cos_i = -0.2  # sin = 0.9798 > 1/1.5 critical
        r = fresnel.fresnel_dielectric(jnp.array(cos_i), 1.5)
        np.testing.assert_allclose(r, 1.0)

    def test_complex_reduces_to_real_when_k_zero(self):
        ci = jnp.linspace(0.05, 1.0, 32)
        r_cplx = fresnel.fr_complex(ci, jnp.full_like(ci, 1.5),
                                    jnp.zeros_like(ci))
        r_real = fresnel.fresnel_dielectric(ci, 1.5)
        np.testing.assert_allclose(r_cplx, r_real, atol=1e-5)

    def test_conductor_reflectance_recovery(self):
        # At normal incidence the k = 2 sqrt(r)/sqrt(1-r), eta=1 mapping
        # reproduces the input reflectance exactly (PBRT-v4 property).
        refl = jnp.array([[0.9, 0.5, 0.1]])
        f0 = fresnel.fresnel_conductor(jnp.array([1.0]), refl)
        np.testing.assert_allclose(f0, refl, atol=1e-4)

    def test_refract_snell(self):
        # straight down through a flat interface at 45 degrees, eta=1.5
        wi = cm.normalize(jnp.array([[1.0, 0.0, 1.0]]))
        n = jnp.array([[0.0, 0.0, 1.0]])
        valid, etap, wt = fresnel.refract(wi, n, 1.5)
        assert bool(valid[0])
        np.testing.assert_allclose(etap, 1.5)
        sin_i = jnp.sqrt(1.0 - cm.cos_theta(wi) ** 2)
        sin_t = jnp.sqrt(wt[0, 0] ** 2 + wt[0, 1] ** 2)
        np.testing.assert_allclose(sin_t, sin_i / 1.5, atol=1e-6)
        assert float(wt[0, 2]) < 0  # transmitted into the lower hemisphere

    def test_refract_tir(self):
        wi = cm.normalize(jnp.array([[1.0, 0.0, 0.2]]))
        n = jnp.array([[0.0, 0.0, -1.0]])  # exiting dense medium
        valid, _, _ = fresnel.refract(wi, n, 1.5)
        assert not bool(valid[0])


class TestMicrofacet:
    @pytest.mark.parametrize("alpha", [0.1, 0.25, 0.64, 1.0])
    def test_ndf_normalization(self, alpha):
        """Integral of D(wm) cos(wm) over the hemisphere == 1."""
        n = 256
        # uniform hemisphere grid via spherical coords (midpoint rule)
        theta = (jnp.arange(n) + 0.5) / n * (jnp.pi / 2)
        phi = (jnp.arange(2 * n) + 0.5) / (2 * n) * (2 * jnp.pi)
        tt, pp = jnp.meshgrid(theta, phi, indexing="ij")
        wm = cm.spherical_direction(jnp.sin(tt), jnp.cos(tt), pp)
        d = microfacet.d(wm, jnp.float32(alpha))
        integrand = d * jnp.cos(tt) * jnp.sin(tt)
        integral = integrand.sum() * (jnp.pi / 2 / n) * (2 * jnp.pi / (2 * n))
        np.testing.assert_allclose(integral, 1.0, rtol=2e-2)

    @pytest.mark.parametrize("alpha", [0.1, 0.25, 0.64])
    def test_vndf_pdf_normalization(self, alpha):
        """Smith masking identity: integral of G1(w) (w.wm) D(wm)/cos(w)
        over the front-facing domain (w.wm > 0) == 1. The AbsDot form the
        reference uses (`Microfacet.h:83`) additionally counts backfacing
        mass, so the unrestricted integral is >= 1."""
        n = 256
        w = cm.normalize(jnp.array([0.4, -0.2, 0.6]))
        theta = (jnp.arange(n) + 0.5) / n * (jnp.pi / 2)
        phi = (jnp.arange(2 * n) + 0.5) / (2 * n) * (2 * jnp.pi)
        tt, pp = jnp.meshgrid(theta, phi, indexing="ij")
        wm = cm.spherical_direction(jnp.sin(tt), jnp.cos(tt), pp)
        wb = jnp.broadcast_to(w, wm.shape)
        pdf = microfacet.pdf(wb, wm, jnp.float32(alpha))
        front = cm.dot(wb, wm) > 0.0
        dw = (jnp.pi / 2 / n) * (2 * jnp.pi / (2 * n))
        front_integral = (jnp.where(front, pdf, 0.0) * jnp.sin(tt)).sum() * dw
        full_integral = (pdf * jnp.sin(tt)).sum() * dw
        np.testing.assert_allclose(front_integral, 1.0, rtol=2e-2)
        assert float(full_integral) >= float(front_integral) - 1e-4

    def test_sample_wm_matches_pdf_mean(self):
        """Sampled wm should have E[1/pdf weights] consistent: the sampled
        cos-theta distribution matches the analytic visible-NDF."""
        alpha = jnp.float32(0.5)
        w = cm.normalize(jnp.broadcast_to(jnp.array([0.3, 0.1, 0.95]),
                                          (65536, 3)))
        seed = rng.tea(jnp.arange(65536, dtype=jnp.uint32), jnp.uint32(11))
        _, wm = microfacet.sample_wm(seed, w, alpha)
        # all in upper hemisphere
        assert float(wm[:, 2].min()) > 0.0
        np.testing.assert_allclose(np.asarray(cm.length(wm)), 1.0, atol=1e-4)
        # Monte Carlo estimate of E[g(wm)] under sampling vs analytic
        # integral of g * pdf for g = cos theta
        mc = float(wm[:, 2].mean())
        n = 256
        theta = (jnp.arange(n) + 0.5) / n * (jnp.pi / 2)
        phi = (jnp.arange(2 * n) + 0.5) / (2 * n) * (2 * jnp.pi)
        tt, pp = jnp.meshgrid(theta, phi, indexing="ij")
        grid = cm.spherical_direction(jnp.sin(tt), jnp.cos(tt), pp)
        pdf = microfacet.pdf(jnp.broadcast_to(w[0], grid.shape), grid, alpha)
        analytic = float((pdf * jnp.cos(tt) * jnp.sin(tt)).sum()
                         * (jnp.pi / 2 / n) * (2 * jnp.pi / (2 * n)))
        assert abs(mc - analytic) < 0.01

    def test_smith_g_bounds(self):
        key = jax.random.PRNGKey(6)
        wo = _rand_unit(key, 256)
        wi = _rand_unit(jax.random.PRNGKey(7), 256)
        g = microfacet.smith_g(wo, wi, jnp.float32(0.5))
        assert float(g.min()) >= 0.0 and float(g.max()) <= 1.0
