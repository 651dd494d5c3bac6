"""Benchmark: pixels/s forward+backward on the BASELINE north-star workload.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline config (BASELINE.json config 4): 1M gaussians, 1080p, SH color
evaluation, forward+backward, single chip. The reference publishes no numbers
(README.md:133-135 is a placeholder and BASELINE.json "published" is empty),
so vs_baseline is reported against the previous round's recorded result
(BENCH_r*.json) when present, else 1.0.

Run directly on the TPU:  python bench.py
Smaller smoke config:     python bench.py --gaussians 100000 --height 600 --width 800
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import time

import jax
import jax.numpy as jnp

from mojosplat_tpu import Camera, RenderConfig, render_gaussians
from mojosplat_tpu import train as mtrain


def build_step(n, H, W, sh_degree, config, mode):
    # The camera is a jit *argument*, never a closure constant: executables
    # that capture pre-existing device buffers as constants fall off this
    # backend's fast dispatch path (~30 ms/call re-staging penalty).
    camera = Camera.create(
        R=jnp.eye(3), T=jnp.zeros(3), H=H, W=W,
        fx=0.5 * W, fy=0.5 * W, cx=W / 2, cy=H / 2,
    )
    raw = mtrain.init_gaussians(
        jax.random.PRNGKey(0), n, sh_degree=sh_degree, position_scale=2.0
    )
    params = mtrain.activate(raw)

    def forward(p, cam):
        return render_gaussians(
            p["means3d"], p["scales"], p["quats"], p["opacities"],
            p["features"], cam, sh_degree=sh_degree,
            background_color=jnp.array([0.1, 0.1, 0.1]), config=config,
        )

    if mode == "fwd":
        fn = jax.jit(forward)
        return lambda p: fn(p, camera), params

    def loss(p, cam):
        img = forward(p, cam)
        return jnp.mean(img**2)

    fn = jax.jit(jax.grad(loss))
    return lambda p: fn(p, camera), params


def previous_round_value(metric: str) -> float | None:
    best = None
    for path in sorted(glob.glob("BENCH_r*.json")):
        try:
            with open(path) as f:
                rec = json.load(f)
            if rec.get("metric") == metric and "value" in rec:
                best = float(rec["value"])
        except Exception:
            continue
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gaussians", type=int, default=1_000_000)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--sh-degree", type=int, default=3)
    ap.add_argument("--mode", choices=["fwd", "fwdbwd"], default="fwdbwd")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--warmup", type=int, default=2)
    args = ap.parse_args()

    config = RenderConfig(
        tile_capacity=512,
        chunk_size=64,
        tile_batch=512,
        max_tile_span=8,
        isect_padding_multiplier=4,
    )
    fn, params = build_step(
        args.gaussians, args.height, args.width,
        args.sh_degree if args.sh_degree >= 0 else None, config, args.mode,
    )

    for _ in range(args.warmup):
        jax.block_until_ready(fn(params))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        jax.block_until_ready(fn(params))
    dt = (time.perf_counter() - t0) / args.iters

    pixels_per_s = args.height * args.width / dt
    metric = (
        f"pixels_per_s_{args.mode}_{args.gaussians // 1000}k_"
        f"{args.height}p_sh{args.sh_degree}"
    )
    prev = previous_round_value(metric)
    vs_baseline = pixels_per_s / prev if prev else 1.0
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(pixels_per_s, 1),
                "unit": "pixels/s",
                "vs_baseline": round(vs_baseline, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
