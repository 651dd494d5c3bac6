"""Utilities: image IO, metrics/timing, checkpointing."""

from .image import save_png, to_uint8
from .metrics import StageTimer, compilation_count, log_render_aux

__all__ = [
    "save_png",
    "to_uint8",
    "StageTimer",
    "compilation_count",
    "log_render_aux",
]
