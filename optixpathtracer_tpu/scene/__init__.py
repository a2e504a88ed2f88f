"""Scene layer: data model, procedural + glTF loading, flattening, BVH
(reference L3 + the GAS build of L5)."""
from . import bvh, procedural, textures  # noqa: F401
from .flatten import SceneData, flatten_model  # noqa: F401
from .types import Material, Mesh, Model, PointLight, Texture  # noqa: F401
