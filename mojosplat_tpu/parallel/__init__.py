"""Multi-device parallelism: mesh construction, sharded render, sharded
projection (camera-DP, tile-row-SP, gaussian-axis parallelism), and the
fully gaussian-sharded all-to-all routed pipeline (gauss_sharded.py)."""

from .gauss_sharded import (
    make_gauss_mesh,
    render_gaussians_sharded,
    train_step_gauss_sharded,
)
from .multihost import init_multihost, is_primary
from .sharding import (
    make_mesh,
    project_gaussians_sharded,
    render_batch_sharded,
)

__all__ = [
    "make_mesh",
    "make_gauss_mesh",
    "init_multihost",
    "is_primary",
    "render_batch_sharded",
    "render_gaussians_sharded",
    "project_gaussians_sharded",
    "train_step_gauss_sharded",
]
