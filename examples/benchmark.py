"""Full-pipeline benchmark: projection + binning + rasterization (+ backward).

This file exists in the reference's README (README.md:130 points users at
``examples/benchmark.py``) but NOT in its tree (SURVEY.md section 6) — we
provide it. Per-stage latencies are measured with device-fenced timers
(StageTimer), plus the fused jitted end-to-end forward and forward+backward.

Usage:
  python examples/benchmark.py --gaussians 100000 --height 608 --width 800
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mojosplat_tpu import Camera, RenderConfig, look_at, render_gaussians  # noqa: E402
from mojosplat_tpu.ops.binning import bin_gaussians_to_tiles  # noqa: E402
from mojosplat_tpu.ops.projection import project_gaussians  # noqa: E402
from mojosplat_tpu.ops.rasterization import rasterize_gaussians  # noqa: E402
from mojosplat_tpu.utils import StageTimer  # noqa: E402
from benchmark_proj import create_camera, generate_gaussian_data  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gaussians", type=int, default=100_000)
    ap.add_argument("--height", type=int, default=608)
    ap.add_argument("--width", type=int, default=800)
    ap.add_argument("--iterations", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--tile-batch", type=int, default=512)
    args = ap.parse_args()

    camera = create_camera(args.height, args.width)
    cfg = RenderConfig(tile_batch=args.tile_batch)
    m, s, q, o = generate_gaussian_data(args.gaussians)
    colors = jax.random.uniform(jax.random.PRNGKey(1), (args.gaussians, 3))
    bg = jnp.array([0.1, 0.1, 0.1])

    # --- per-stage (each stage jitted separately) ---
    proj_fn = jax.jit(lambda m, s, q, o: project_gaussians(m, s, q, o, camera, cfg))
    bin_fn = jax.jit(
        lambda m2, r, d: bin_gaussians_to_tiles(
            m2, r, d, camera.H, camera.W, cfg
        )
    )
    rast_fn = jax.jit(
        lambda m2, cn, c, o, b: rasterize_gaussians(
            m2, cn, c, o, bg, b, camera.H, camera.W, cfg
        )
    )

    timer = StageTimer()
    proj = proj_fn(m, s, q, o)
    binning = bin_fn(proj.means2d, proj.radii, proj.depths)
    rast_fn(proj.means2d, proj.conics, colors, o, binning)  # compile
    for _ in range(args.iterations):
        proj = timer.time_fn("projection", proj_fn, m, s, q, o)
        binning = timer.time_fn(
            "binning", bin_fn, proj.means2d, proj.radii, proj.depths
        )
        timer.time_fn(
            "rasterization", rast_fn, proj.means2d, proj.conics, colors, o,
            binning,
        )

    # --- fused end-to-end forward and forward+backward ---
    fwd = jax.jit(
        lambda m, s, q, o, c: render_gaussians(
            m, s, q, o, c, camera, background_color=bg, config=cfg
        )
    )
    loss = lambda m, s, q, o, c: jnp.mean(fwd(m, s, q, o, c) ** 2)
    bwd = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))

    for name, fn in [("e2e_forward", fwd), ("e2e_fwd_bwd", bwd)]:
        for _ in range(args.warmup):
            jax.block_until_ready(fn(m, s, q, o, colors))
        for _ in range(args.iterations):
            timer.time_fn(name, fn, m, s, q, o, colors)

    npix = args.height * args.width
    print(f"\nN={args.gaussians}  {args.width}x{args.height}  "
          f"isects={int(binning.aux.num_isects)}")
    print(f"{'stage':<16} {'mean ms':>10} {'min ms':>10} {'Mpix/s':>10}")
    print("-" * 50)
    for name, stats in timer.summary().items():
        print(
            f"{name:<16} {stats['mean_ms']:>10.3f} {stats['min_ms']:>10.3f} "
            f"{npix / stats['mean_ms'] / 1e3:>10.2f}"
        )


if __name__ == "__main__":
    main()
