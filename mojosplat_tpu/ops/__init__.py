"""Core pipeline stages: projection, binning, rasterization, SH evaluation."""

from .binning import BinningAux, BinningResult, bin_gaussians_to_tiles
from .projection import ProjectionResult, project_gaussians
from .rasterization import (
    RasterAux,
    rasterize_dense_oracle,
    rasterize_gaussians,
)
from .sh import eval_sh, num_sh_bases, sh_to_color

__all__ = [
    "project_gaussians",
    "ProjectionResult",
    "bin_gaussians_to_tiles",
    "BinningResult",
    "BinningAux",
    "rasterize_gaussians",
    "rasterize_dense_oracle",
    "RasterAux",
    "eval_sh",
    "sh_to_color",
    "num_sh_bases",
]
