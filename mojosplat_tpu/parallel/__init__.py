"""Multi-device parallelism: mesh construction, sharded render, sharded
projection (camera-DP, tile-row-SP, gaussian-axis parallelism)."""

from .sharding import (
    make_mesh,
    project_gaussians_sharded,
    render_batch_sharded,
)

__all__ = [
    "make_mesh",
    "render_batch_sharded",
    "project_gaussians_sharded",
]
