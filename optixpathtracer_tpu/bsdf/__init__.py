"""BSDF library: f/sample/pdf triples batched over wavefronts (reference L2,
SURVEY.md section 2.3). All lobes operate in the local shading frame
(normal = +z) and are differentiable w.r.t. their material parameters."""
from . import conductor, dielectric, diffuse, dispatch, glossy_diffuse  # noqa: F401
from .base import (BSDFSample, is_effectively_smooth,  # noqa: F401
                   roughness_to_alpha, where_sample)
from .dispatch import (CONDUCTOR, DIELECTRIC, DIFFUSE,  # noqa: F401
                       GLOSSY_DIFFUSE, METALLIC_MIX, MaterialParams)
