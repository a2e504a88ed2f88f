"""First-class material model + wavefront BSDF dispatch.

The reference dispatches BSDFs with a per-hit stochastic `conductor` flag
(`devicePrograms.cu:400`: conductor = rnd < metallic) and reaches its pure
diffuse/dielectric lobes only via commented-out code
(`devicePrograms.cu:303-341`). SURVEY.md section 2.3 directs: make the
material model a first-class per-mesh enum. These are the types:

  DIFFUSE        pure Lambert           (reference LambertDiffuse path)
  CONDUCTOR      rough/smooth metal     (reference Conductor path)
  DIELECTRIC     glass, refl+trans      (reference Dielectric path)
  GLOSSY_DIFFUSE layered coat+diffuse   (reference GlossyDiffuse path)
  METALLIC_MIX   stochastic conductor-vs-layered by `metallic` - the
                 reference's actual runtime behavior (`devicePrograms.cu:400`)

Wavefront dispatch evaluates every lobe and lane-selects. That costs the sum
of all lobes per bounce but keeps the wavefront dense and the XLA graph
static; material-sorted partitioning is the planned optimization (SURVEY.md
section 7 "hard parts" (4)).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core import rng
from . import conductor as _conductor
from . import dielectric as _dielectric
from . import diffuse as _diffuse
from . import glossy_diffuse as _glossy
from .base import BSDFSample, where_sample

DIFFUSE = 0
CONDUCTOR = 1
DIELECTRIC = 2
GLOSSY_DIFFUSE = 3
METALLIC_MIX = 4

MATERIAL_NAMES = {
    "diffuse": DIFFUSE,
    "conductor": CONDUCTOR,
    "dielectric": DIELECTRIC,
    "glossy_diffuse": GLOSSY_DIFFUSE,
    "metallic_mix": METALLIC_MIX,
}


class MaterialParams(NamedTuple):
    """Per-lane material parameters (SoA over the wavefront).

    The analog of the reference's per-mesh `MeshSBTData` scalars
    (`MeshSBTData.h:6-29`) after texture modulation, plus the first-class
    `mat_type` enum.
    """
    albedo: jnp.ndarray     # [..., 3] linear
    metallic: jnp.ndarray   # [...]
    roughness: jnp.ndarray  # [...]
    ior: jnp.ndarray        # [...] dielectric/coat IOR (reference: 1.5)
    mat_type: jnp.ndarray   # [...] int32 enum above


def resolve_stochastic_lobe(seed, mat: MaterialParams):
    """Resolve METALLIC_MIX into CONDUCTOR / GLOSSY_DIFFUSE with one draw per
    lane (reference `devicePrograms.cu:400`), drawn once per hit so NEE and
    BSDF sampling agree on the lobe. Returns (seed, resolved MaterialParams).
    """
    seed, u = rng.rnd(seed)
    is_mix = mat.mat_type == METALLIC_MIX
    picked = jnp.where(u < mat.metallic, CONDUCTOR, GLOSSY_DIFFUSE)
    new_type = jnp.where(is_mix, picked, mat.mat_type)
    return seed, mat._replace(mat_type=new_type.astype(jnp.int32))


ALL_LOBES = (DIFFUSE, CONDUCTOR, DIELECTRIC, GLOSSY_DIFFUSE)


def _mirror_z(v):
    """Reflect a local-frame direction through the tangent plane."""
    return v * jnp.array([1.0, 1.0, -1.0], v.dtype)


# Two-sidedness: surfaces keep their true (winding) orientation, so backface
# hits see wo.z < 0. The reference handles this by flipping normals on
# backface hits (`devicePrograms.cu:379-382`); the dielectric here instead
# needs the TRUE orientation (signed cos drives the eta flip), so the
# one-sided lobes (diffuse, conductor) are made two-sided PBRT-style at
# dispatch: mirror wo/wi through the tangent plane when wo.z < 0 (the
# layered lobe already self-flips, `GlossyDiffuse.h:110-135`).


def _gated(gates, lobe, seed, eval_fn, zero_fn):
    """Run `eval_fn(seed)` (returns (seed, value)) under a runtime scalar
    gate: when `gates` is provided and gates[lobe] is False, skip the lobe
    entirely at runtime (lax.cond) and return zero_fn(). Used by the
    material-sorted shading path (integrate/path.py material_sort): after a
    material counting-sort, most contiguous segments contain one material
    type, so the other lobes' whole evaluation - including the layered
    walk - is skipped at runtime while the XLA graph stays static.

    NB: a skipped lobe does not advance the per-lane RNG streams it would
    have consumed, so material-sorted images differ from unsorted ones by
    sample decorrelation (equally unbiased, not bit-identical)."""
    import jax
    if gates is None:
        return eval_fn(seed)
    return jax.lax.cond(gates[lobe], eval_fn,
                        lambda s: (s, zero_fn()), seed)


def f(seed, mat: MaterialParams, wo, wi, active_lobes=ALL_LOBES,
      gates=None):
    """Evaluate the BSDF for every lane (resolved types only - call
    `resolve_stochastic_lobe` first). Returns (seed, rgb).

    active_lobes (a static tuple) prunes lobes absent from the scene's
    material table - the wavefront pays only for lobe types that exist
    (e.g. an all-diffuse Cornell never traces the layered walk).
    gates (optional dict lobe -> scalar bool) additionally skips lobes at
    RUNTIME via lax.cond - see _gated."""
    t = mat.mat_type[..., None]
    flip = (wo[..., 2] < 0.0)[..., None]
    wo_m = jnp.where(flip, _mirror_z(wo), wo)
    wi_m = jnp.where(flip, _mirror_z(wi), wi)
    zero3 = lambda: jnp.zeros(wo.shape[:-1] + (3,), jnp.float32)  # noqa: E731
    out = zero3()
    if DIFFUSE in active_lobes:
        _, f_d = _gated(gates, DIFFUSE, seed,
                        lambda s: (s, _diffuse.f(mat.albedo, wo_m, wi_m)),
                        zero3)
        out = jnp.where(t == DIFFUSE, f_d, out)
    if CONDUCTOR in active_lobes:
        _, f_c = _gated(gates, CONDUCTOR, seed,
                        lambda s: (s, _conductor.f(mat.albedo,
                                                   mat.roughness, wo_m,
                                                   wi_m)), zero3)
        out = jnp.where(t == CONDUCTOR, f_c, out)
    if DIELECTRIC in active_lobes:
        # Pure dielectric lobe modulated by albedo as in the reference's
        # commented dispatch (`devicePrograms.cu:333`).
        _, f_x = _gated(gates, DIELECTRIC, seed,
                        lambda s: (s, _dielectric.f(mat.roughness, wo, wi,
                                                    eta=mat.ior)
                                   * mat.albedo), zero3)
        out = jnp.where(t == DIELECTRIC, f_x, out)
    if GLOSSY_DIFFUSE in active_lobes:
        seed, f_glossy = _gated(
            gates, GLOSSY_DIFFUSE, seed,
            lambda s: _glossy.f(s, mat.albedo, mat.roughness, wo, wi,
                                eta=mat.ior), zero3)
        out = jnp.where(t == GLOSSY_DIFFUSE, f_glossy, out)
    return seed, out


def sample(seed, mat: MaterialParams, wo, active_lobes=ALL_LOBES,
           gates=None):
    """Importance-sample the BSDF per lane. Returns (seed, BSDFSample).
    gates: see f()."""
    t = mat.mat_type
    flip = (wo[..., 2] < 0.0)[..., None]
    wo_m = jnp.where(flip, _mirror_z(wo), wo)

    def _unflip(s):
        return s._replace(direction=jnp.where(flip, _mirror_z(s.direction),
                                              s.direction))

    invalid = lambda: BSDFSample.invalid(wo.shape[:-1])  # noqa: E731
    out = invalid()
    if DIFFUSE in active_lobes:
        seed, s_diffuse = _gated(
            gates, DIFFUSE, seed,
            lambda s: _diffuse.sample(s, mat.albedo, wo_m), invalid)
        out = where_sample(t == DIFFUSE, _unflip(s_diffuse), out)
    if CONDUCTOR in active_lobes:
        seed, s_conductor = _gated(
            gates, CONDUCTOR, seed,
            lambda s: _conductor.sample(s, mat.albedo, mat.roughness, wo_m),
            invalid)
        out = where_sample(t == CONDUCTOR, _unflip(s_conductor), out)
    if DIELECTRIC in active_lobes:
        def _samp_x(s):
            s, sx = _dielectric.sample(s, mat.roughness, wo, eta=mat.ior)
            return s, sx._replace(color=sx.color * mat.albedo)
        seed, s_dielectric = _gated(gates, DIELECTRIC, seed, _samp_x,
                                    invalid)
        out = where_sample(t == DIELECTRIC, s_dielectric, out)
    if GLOSSY_DIFFUSE in active_lobes:
        seed, s_glossy = _gated(
            gates, GLOSSY_DIFFUSE, seed,
            lambda s: _glossy.sample(s, mat.albedo, mat.roughness, wo,
                                     eta=mat.ior), invalid)
        out = where_sample(t == GLOSSY_DIFFUSE, s_glossy, out)
    return seed, out


def pdf(mat: MaterialParams, wo, wi, layered: str = "error"):
    """Sampling pdf per lane (deterministic lobes).

    The layered (GLOSSY_DIFFUSE) lobe has no closed-form pdf - the
    reference's own pdf is a stochastic single-walk estimate
    (`GlossyDiffuse.h:372-524` pdf tracking) and the integrator never uses
    it (no MIS). To keep a silent bias out of anything that starts trusting
    this function:

      layered="error"  (default) layered lanes return NaN, poisoning any
                       downstream use loudly instead of biasing it quietly.
      layered="approx" layered lanes use the 0.5*(diffuse + coat-reflection)
                       entrance-lobe mix - a usable MIS-style proxy, opt-in
                       (validated against the sampling histogram in
                       tests/test_bsdf.py::test_layered_approx_pdf_is_usable_proxy).

    MIS DECISION (VERDICT r2 item 10, recorded here so a future round does
    not stumble into it): the integrator deliberately has NO BSDF-sampling
    MIS, and adding one today would be a no-op, not an improvement. The
    framework's only light type is the reference's delta point light
    (`LightsStruct.h:6-10`): BSDF sampling hits a measure-zero point with
    probability 0, so NEE is the only technique that can see a light and its
    MIS weight is identically 1 (`devicePrograms.cu:444-472` has no MIS for
    the same reason). IF a future round adds *area* lights, MIS becomes
    real, and the layered weight must use layered="approx" (any partition of
    unity keeps MIS unbiased - the proxy costs variance, not correctness) -
    never the default NaN path, and never a silent fallback to 0.
    """
    if layered not in ("error", "approx"):
        raise ValueError(f"layered={layered!r} (want 'error' or 'approx')")
    flip = (wo[..., 2] < 0.0)[..., None]
    wo_m = jnp.where(flip, _mirror_z(wo), wo)
    wi_m = jnp.where(flip, _mirror_z(wi), wi)
    p_diffuse = _diffuse.pdf(wo_m, wi_m)
    p_conductor = _conductor.pdf(mat.roughness, wo_m, wi_m)
    p_dielectric = _dielectric.pdf(mat.roughness, wo, wi, eta=mat.ior)
    if layered == "approx":
        # Layered: coat reflection + diffuse lobe mix as a usable proxy.
        p_glossy = 0.5 * (p_diffuse + _dielectric.pdf(
            mat.roughness, wo, wi, eta=mat.ior, transmission=False))
    else:
        p_glossy = jnp.full_like(p_diffuse, jnp.nan)

    t = mat.mat_type
    return jnp.where(t == DIFFUSE, p_diffuse,
           jnp.where(t == CONDUCTOR, p_conductor,
           jnp.where(t == DIELECTRIC, p_dielectric, p_glossy)))
