"""Wavefront integrator (reference L4-L6 device+view logic)."""
from .path import render, render_sample, trace_paths  # noqa: F401
from .surface import Surface, make_surface  # noqa: F401
