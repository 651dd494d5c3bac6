"""Utilities: image IO, PLY scene IO, metrics/timing, checkpointing."""

from .image import save_png, to_uint8
from .metrics import StageTimer, compilation_count, log_render_aux
from .ply import load_gaussian_ply, save_gaussian_ply
from .profiling import annotate, roofline_report, trace

__all__ = [
    "save_png",
    "to_uint8",
    "StageTimer",
    "compilation_count",
    "log_render_aux",
    "load_gaussian_ply",
    "save_gaussian_ply",
    "annotate",
    "roofline_report",
    "trace",
]
