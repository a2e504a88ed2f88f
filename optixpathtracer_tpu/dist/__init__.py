"""Distribution layer: device-mesh sharding + collectives (new capability;
the reference is single-GPU, SURVEY.md section 2.5)."""
from .sharding import (make_mesh, material_grad_step,  # noqa: F401
                       render_sample_sharded)
