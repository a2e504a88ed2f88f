"""Differentiable-rendering utilities: pixel gradients w.r.t. material
parameters and finite-difference validation (BASELINE.md target: pixel
gradients for roughness / IOR / albedo allclose vs finite differences).

Estimator: detached sampling (sample locations carry no parameter gradient -
see core/microfacet.sample_wm and intersect/api.py). Consequences:
  * albedo / light gradients: exact per-sample (sampling never depends on
    them in the diffuse/conductor paths), so same-seed finite differences
    match to float tolerance;
  * roughness / IOR gradients: unbiased in expectation; same-seed finite
    differences additionally capture the (detached) sampling-warp term, so
    validation uses multi-sample means with statistical tolerances;
  * discrete decisions (lobe picks, RR, visibility) contribute no gradient -
    the standard detached-mode limitation, shared with PBRT-v4/Mitsuba
    detached estimators.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

DIFF_FIELDS = ("mat_albedo", "mat_metallic", "mat_roughness", "mat_ior",
               "light_color")


def render_loss_fn(scene, cam_params, width, height, frames,
                   max_bounces=2, intersect_method="brute",
                   loss="mean"):
    """Build loss(params) -> scalar where params is the dict of
    differentiable scene fields. `frames` is a list of frame ids averaged
    over (more frames = lower estimator variance)."""
    from ..integrate.path import render_sample
    pos, inv_view, inv_proj = cam_params

    def loss_fn(params):
        s = scene._replace(**params)
        acc = 0.0
        for fid in frames:
            img = render_sample(s, pos, inv_view, inv_proj, width, height,
                                jnp.uint32(fid), max_bounces,
                                intersect_method)
            acc = acc + img
        img = acc / len(frames)
        if loss == "mean":
            return jnp.mean(img)
        raise ValueError(loss)

    return loss_fn


def param_gradients(scene, cam_params, width, height, frames,
                    fields=DIFF_FIELDS, **kw):
    """Gradients of mean image intensity w.r.t. the given scene fields."""
    fields = [f for f in fields if hasattr(scene, f)]
    params = {f: getattr(scene, f) for f in fields}
    loss_fn = render_loss_fn(scene, cam_params, width, height, frames, **kw)
    return jax.grad(loss_fn)(params)


def finite_difference(scene, cam_params, width, height, frames, field,
                      index, h=1e-3, **kw):
    """Central finite difference of the same loss w.r.t. one scalar entry
    of a scene field (same seeds on both sides - deterministic RNG makes
    this noise-free for parameters that don't steer sampling)."""
    loss_fn = render_loss_fn(scene, cam_params, width, height, frames, **kw)
    base = np.asarray(getattr(scene, field))

    def eval_at(delta):
        arr = base.copy()
        arr[index] += delta
        params = {field: jnp.asarray(arr)}
        return float(loss_fn(params))

    return (eval_at(h) - eval_at(-h)) / (2.0 * h)
