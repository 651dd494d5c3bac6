"""Benchmark: pixels/s forward+backward on the BASELINE north-star workload.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline config (BASELINE.json config 4): 1M gaussians, 1080p, SH color
evaluation, forward+backward, single chip, Pallas rasterization kernels.
The reference publishes no numbers (README.md:133-135 is a placeholder and
BASELINE.json "published" is empty), so vs_baseline is reported against the
previous round's recorded result (BENCH_r*.json) when present, else 1.0.

Measurement notes (this machine): the TPU tunnel adds ~30 ms per
synchronized dispatch, so the timed iterations run *inside* one jit via
lax.scan (chained through the carry); the reported time is
(N-iter call - 1-iter call) / (N - 1), which cancels the per-call overhead.
Device arrays are always jit arguments, never closure constants.

Run directly on the TPU:  python bench.py
Smaller smoke config:     python bench.py --gaussians 100000 --height 600 --width 800
"""

from __future__ import annotations

import argparse
import functools
import glob
import json
import os
import sys
import time

import jax

# This machine's TPU plugin force-selects itself via jax config, overriding
# the JAX_PLATFORMS env var (see tests/conftest.py). Honor the env var here
# so `JAX_PLATFORMS=cpu python bench.py --skip-probe` really runs on CPU.
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp

from mojosplat_tpu import Camera, RenderConfig, render_gaussians
from mojosplat_tpu import train as mtrain


def load_scene_params(path):
    """Trained-scene params from a compressed .npz or gaussian .ply."""
    if path.endswith(".npz"):
        from mojosplat_tpu.utils.compress import load_compressed_scene

        raw = load_compressed_scene(path)
    else:
        from mojosplat_tpu.utils.ply import load_gaussian_ply

        raw = load_gaussian_ply(path)
    return mtrain.activate({k: jnp.asarray(v) for k, v in raw.items()})


def scene_camera(H, W):
    """Deterministic eval view of the synthetic capture's scene: the ring
    convention of scripts/make_synth_colmap.py (orbit radius 3.9, target
    [0, 0.4, 0], fx = 0.72 W) at an angle none of the training views use."""
    import numpy as np

    ang = 0.618  # golden-angle-ish: between training views
    eye = np.array([3.9 * np.sin(ang), -0.75, 3.9 * np.cos(ang)])
    up = np.array([0.0, 1.0, 0.0])
    forward = np.array([0.0, 0.4, 0.0]) - eye
    forward /= np.linalg.norm(forward)
    right = np.cross(forward, up)
    right /= np.linalg.norm(right)
    down = np.cross(forward, right)
    R = np.stack([right, down, forward]).astype(np.float32)
    T = (-R @ eye).astype(np.float32)
    return Camera.create(
        R=R, T=T, H=H, W=W, fx=0.72 * W, fy=0.72 * W, cx=W / 2, cy=H / 2,
    )


def build_loop(n, H, W, sh_degree, config, mode, iters, family="3dgs",
               maps=False, scene_params=None):
    if scene_params is not None:
        params = scene_params
        camera = scene_camera(H, W)
    else:
        camera = Camera.create(
            R=jnp.eye(3), T=jnp.zeros(3), H=H, W=W,
            fx=0.5 * W, fy=0.5 * W, cx=W / 2, cy=H / 2,
        )
        params = mtrain.activate(
            mtrain.init_gaussians(
                jax.random.PRNGKey(0), n, sh_degree=sh_degree,
                position_scale=2.0,
            )
        )
    if family == "2dgs":
        from mojosplat_tpu.surfel import render_surfels

        params["scales"] = params["scales"][:, :2]  # disks
        render = render_surfels
    else:
        render = render_gaussians

    def aux_counters(p, cam):
        # Honest-headline counters: how much blend work the static budgets
        # (max_tile_span / capacity / tile_capacity) actually dropped for
        # this scene. Forward-only; compiled separately from the timed loop.
        out = render(
            p["means3d"], p["scales"], p["quats"], p["opacities"],
            p["features"], cam, sh_degree=sh_degree,
            background_color=jnp.array([0.1, 0.1, 0.1]), config=config,
            return_aux=True,
        )
        aux = out[-1]
        return (aux.binning.num_isects, aux.binning.capacity_overflow,
                aux.binning.span_truncated, aux.raster.tile_overflow,
                aux.binning.tight_culled)

    def forward(p, cam):
        if maps:
            # Full 2DGS output surface: rgb + intersection depth + normals
            # + distortion map (the training configuration with the
            # paper's regularizers), all from the aux kernel pass.
            img, depth, normal, dist = render(
                p["means3d"], p["scales"], p["quats"], p["opacities"],
                p["features"], cam, sh_degree=sh_degree,
                background_color=jnp.array([0.1, 0.1, 0.1]), config=config,
                return_depth=True, return_normals=True,
                return_distortion=True,
            )
            return (jnp.mean(img**2) + 1e-3 * jnp.mean(depth**2)
                    + 1e-3 * jnp.mean(normal**2) + 1e-3 * jnp.mean(dist))
        return render(
            p["means3d"], p["scales"], p["quats"], p["opacities"],
            p["features"], cam, sh_degree=sh_degree,
            background_color=jnp.array([0.1, 0.1, 0.1]), config=config,
        )

    def scalar(p, cam):
        out = forward(p, cam)
        # maps mode already returns the combined scalar loss; the plain
        # mode keeps the historical reductions (sum fwd / mean-square
        # fwdbwd) so metrics stay comparable across rounds.
        if maps:
            return out
        return jnp.sum(out) if mode == "fwd" else jnp.mean(out**2)

    def one(p, cam):
        if mode == "fwd":
            return scalar(p, cam)
        g = jax.grad(lambda q: scalar(q, cam))(p)
        return sum(jnp.sum(v) for v in g.values())

    def loop(p, cam, iters):
        def body(carry, _):
            q = dict(p)
            q["means3d"] = p["means3d"] + carry * 0.0
            return one(q, cam), None

        out, _ = jax.lax.scan(body, 0.0, None, length=iters)
        return out

    return (
        jax.jit(functools.partial(loop, iters=iters)),
        jax.jit(functools.partial(loop, iters=1)),
        params,
        camera,
        jax.jit(aux_counters),
    )


def previous_round_value(metric: str) -> float | None:
    best = None
    for path in sorted(glob.glob("BENCH_r*.json")):
        try:
            with open(path) as f:
                rec = json.load(f)
            # The driver nests the parsed JSON line under "parsed".
            rec = rec.get("parsed", rec)
            if rec.get("metric") == metric and "value" in rec:
                best = float(rec["value"])
        except Exception:
            continue
    return best


# BASELINE.md measurement configs (1-4 single chip; 5 is the sharded
# training step, exercised by __graft_entry__.dryrun_multichip / the
# sharding tests since one local chip cannot host a mesh).
# chunk: sparse workloads (low mean gaussians/tile) prefer K=128 — the
# count guard is chunk-granular, so K=256 rounds a ~100-slot tile up to a
# full 256-lane chunk; the dense headline amortizes per-chunk overhead
# better at 256 (measured: preset 2 55.3M px/s @128 vs 51.0M @256; preset
# 4 15.7M @256 vs 14.3M @128).
# Preset 4 (r5): 32x32 tiles at 1/4 slot capacity hold the blend budget
# constant while quartering the permutation row count — 128.5 -> 66.8 ms
# measured at 91.4 dB vs an opened per-tile budget (BASELINE.md round-5
# tile-size study; span 4 tiles x 32 px = the same 128-px footprint).
# Preset 6: the trained-scene honest headline (VERDICT r4 #2) — real
# converged splats, capacity open enough that isect_keep_fraction ~1.
PRESETS = {
    1: dict(gaussians=1_000, height=256, width=256, sh_degree=-1, mode="fwd",
            chunk=128, tile_size=16, span=8, capacity_mult=4,
            tile_capacity=512, tps=8),
    2: dict(gaussians=100_000, height=600, width=800, sh_degree=-1,
            mode="fwd", chunk=128, tile_size=16, span=8, capacity_mult=4,
            tile_capacity=512, tps=8),
    3: dict(gaussians=100_000, height=600, width=800, sh_degree=-1,
            mode="fwdbwd", chunk=128, tile_size=16, span=8, capacity_mult=4,
            tile_capacity=512, tps=8),
    4: dict(gaussians=1_000_000, height=1080, width=1920, sh_degree=3,
            mode="fwdbwd", chunk=128, tile_size=32, span=4,
            capacity_mult=1, tile_capacity=512, tps=2),
    6: dict(scene="assets/trained_scene_1m.npz", height=1080, width=1920,
            sh_degree=3, mode="fwdbwd", chunk=128, tile_size=32, span=4,
            capacity_mult=8, tile_capacity=512, tps=2, tight_cull=True),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", type=int, choices=sorted(PRESETS),
                    help="BASELINE.md measurement config number")
    ap.add_argument("--gaussians", type=int, default=1_000_000)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--sh-degree", type=int, default=3)
    ap.add_argument("--mode", choices=["fwd", "fwdbwd"], default="fwdbwd")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--impl", default="pallas", choices=["xla", "pallas"])
    ap.add_argument("--tps", type=int, default=2,
                    help="pallas tiles per grid step")
    ap.add_argument("--chunk", type=int, default=128,
                    help="pallas gaussians per chunk")
    ap.add_argument("--tile-size", type=int, default=32,
                    help="raster tile size in pixels")
    ap.add_argument("--span", type=int, default=4,
                    help="max tile span per gaussian per axis")
    ap.add_argument("--capacity-mult", type=int, default=1,
                    help="intersection capacity as a multiple of N")
    ap.add_argument("--tile-capacity", type=int, default=512,
                    help="per-tile slot capacity")
    ap.add_argument(
        "--tight-cull", action=argparse.BooleanOptionalAction,
        default=False,
        help="contribution-aware intersection culling (3DGS only): drop "
        "AABB slots whose peak alpha over the tile cannot reach the blend "
        "threshold",
    )
    ap.add_argument(
        "--family", default="3dgs", choices=["3dgs", "2dgs"],
        help="primitive family (2dgs = the surfel Pallas kernels; metric "
        "name gets a _2dgs suffix)",
    )
    ap.add_argument(
        "--maps", action="store_true",
        help="2dgs only: render the full output surface (depth/normal/"
        "distortion maps) through the aux kernels; metric suffix _maps",
    )
    ap.add_argument(
        "--bf16-grads", action=__import__("argparse").BooleanOptionalAction,
        default=True,
        help="route per-slot gradients in bf16 (bit-identical on TPU under "
        "excess-precision rules, ~3%% faster backward)",
    )
    ap.add_argument("--skip-probe", action="store_true",
                    help="skip the device-reachability probe (dev/CPU runs)")
    ap.add_argument(
        "--scene", default=None,
        help="render a trained scene artifact (.npz compressed or .ply) "
        "instead of the random-init cloud; the metric name gains a "
        "_trained suffix and --gaussians is taken from the file",
    )
    ap.add_argument(
        "--report-aux", action=argparse.BooleanOptionalAction, default=True,
        help="include the binning/raster drop counters (num_isects, "
        "capacity_overflow, span_truncated, tile_overflow) and the "
        "roofline fraction_of_light in the JSON line (costs one extra "
        "forward compile)",
    )
    args = ap.parse_args()
    if args.maps and args.family != "2dgs":
        ap.error("--maps requires --family 2dgs")
    if args.preset is not None:
        for k, v in PRESETS[args.preset].items():
            setattr(args, k.replace("-", "_"), v)

    # Device probe in a subprocess with a hard timeout: this machine's TPU
    # tunnel has multi-hour outages during which EVERY dispatch hangs
    # (even jnp.ones). Fail fast with an honest zero-value JSON line the
    # harness can record instead of hanging the whole bench run.
    if not args.skip_probe:
        import subprocess

        try:
            subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp; "
                 "jax.jit(lambda a: a * 2)(jnp.ones((8, 128)))"
                 ".block_until_ready()"],
                timeout=180, capture_output=True, check=True,
            )
        except (subprocess.TimeoutExpired,
                subprocess.CalledProcessError) as e:
            print(json.dumps({
                "metric": "pixels_per_s_unavailable",
                "value": 0,
                "unit": "pixels/s",
                "vs_baseline": 0,
                "error": "device unreachable (tunnel outage): "
                         + type(e).__name__,
            }))
            return

    config = RenderConfig(
        tile_size=args.tile_size,
        tile_capacity=args.tile_capacity,
        chunk_size=64,
        tile_batch=512,
        max_tile_span=args.span,
        isect_padding_multiplier=args.capacity_mult,
        tight_cull=args.tight_cull,
        raster_impl=args.impl,
        pallas_chunk=args.chunk,
        pallas_tiles_per_step=args.tps,
        grad_route_bf16=args.bf16_grads,
    )
    sh = args.sh_degree if args.sh_degree >= 0 else None
    scene_params = None
    if args.scene:
        scene_params = load_scene_params(args.scene)
        args.gaussians = int(scene_params["means3d"].shape[0])
        k = scene_params["features"].shape[1]
        args.sh_degree = int(round(k ** 0.5)) - 1
        sh = args.sh_degree
    fn, fn1, params, camera, aux_fn = build_loop(
        args.gaussians, args.height, args.width, sh, config, args.mode,
        args.iters, family=args.family, maps=args.maps,
        scene_params=scene_params,
    )

    float(fn1(params, camera))  # compile
    float(fn(params, camera))  # compile
    t0 = time.perf_counter()
    float(fn1(params, camera))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(fn(params, camera))
    total = time.perf_counter() - t0
    dt = (total - t1) / (args.iters - 1)

    pixels_per_s = args.height * args.width / dt
    metric = (
        f"pixels_per_s_{args.mode}_{args.gaussians // 1000}k_"
        f"{args.height}p_sh{args.sh_degree}"
        + ("_2dgs" if args.family == "2dgs" else "")
        + ("_maps" if args.maps else "")
        + ("_trained" if args.scene else "")
    )
    prev = previous_round_value(metric)
    vs_baseline = pixels_per_s / prev if prev else 1.0
    record = {
        "metric": metric,
        "value": round(pixels_per_s, 1),
        "unit": "pixels/s",
        "vs_baseline": round(vs_baseline, 4),
    }
    if args.report_aux:
        num_isects, cap_of, span_tr, tile_of, tight_cl = map(
            int, aux_fn(params, camera))
        from mojosplat_tpu.utils.profiling import roofline_report

        kind = jax.devices()[0].device_kind.lower()
        chip = ("v5p" if "v5p" in kind or "v5 pod" in kind
                else "v5e" if "v5" in kind
                else "v4" if "v4" in kind else "cpu")
        rep = roofline_report(
            step_ms=dt * 1e3,
            n_pixels=args.height * args.width,
            n_isects=num_isects,
            n_gaussians=args.gaussians,
            sh_bases=(args.sh_degree + 1) ** 2 if sh is not None else 1,
            backward=args.mode == "fwdbwd",
            chip=chip,
            tile_size=args.tile_size,
        )
        # Tight-culled slots are provably zero-contribution, so they are
        # not part of the honest demand (the kernels would zero them).
        demanded = num_isects + cap_of + span_tr
        record.update({
            "step_ms": round(dt * 1e3, 2),
            "num_isects": num_isects,
            "capacity_overflow": cap_of,
            "span_truncated": span_tr,
            "tile_overflow": tile_of,
            "tight_culled": tight_cl,
            "tile_size": args.tile_size,
            "isect_keep_fraction": round(num_isects / max(demanded, 1), 4),
            "light_speed_ms": round(rep.light_speed_ms, 2),
            "fraction_of_light": round(rep.fraction_of_light, 4),
            "chip": chip,
        })
    print(json.dumps(record))


if __name__ == "__main__":
    main()
