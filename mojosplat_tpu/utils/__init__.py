"""Utilities: image IO, PLY scene IO, metrics/timing, checkpointing."""

from .image import save_png, to_uint8
from .metrics import StageTimer, compilation_count, log_render_aux
from .ply import load_gaussian_ply, save_gaussian_ply
from .splat import load_gaussian_splat, save_gaussian_splat
from .profiling import annotate, roofline_report, trace

__all__ = [
    "save_png",
    "to_uint8",
    "StageTimer",
    "compilation_count",
    "log_render_aux",
    "load_gaussian_ply",
    "save_gaussian_ply",
    "load_gaussian_splat",
    "save_gaussian_splat",
    "annotate",
    "roofline_report",
    "trace",
]
