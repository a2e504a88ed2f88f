"""Ray-scene intersection (replaces OptiX RT-core traversal, reference L4)."""
from . import brute, bvh_traverse  # noqa: F401
from .api import intersect_any, intersect_closest  # noqa: F401
from .types import Hit  # noqa: F401
