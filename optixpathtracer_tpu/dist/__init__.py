"""Distribution layer: device-mesh sharding + collectives (new capability;
the reference is single-GPU, SURVEY.md section 2.5)."""
from .sharding import (initialize_distributed, make_mesh,  # noqa: F401
                       material_grad_step, render_rows,
                       render_sample_sharded)
