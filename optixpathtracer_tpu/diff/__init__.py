"""Differentiable rendering: gradients to material parameters + checks
(new capability; BASELINE.md gradient targets)."""
from .gradcheck import (DIFF_FIELDS, finite_difference,  # noqa: F401
                        param_gradients, render_loss_fn)
