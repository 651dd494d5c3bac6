"""Sweep (pallas_tiles_per_step, pallas_chunk) on the raster stage ONLY, at
the headline workload, inside one process so the 200+ MB parameter upload and
the precompute happen once. See dev_bench.py header for measurement rules.

Usage: python -c "import runpy,sys; sys.argv=['x']; runpy.run_path(
    'scripts/dev_sweep_raster.py', run_name='__main__')"
"""

import dataclasses
import functools
import time

import jax
import jax.numpy as jnp

from mojosplat_tpu import Camera, RenderConfig
from mojosplat_tpu import train as mtrain
from mojosplat_tpu.ops.binning import bin_gaussians_to_tiles, num_tiles
from mojosplat_tpu.ops.raster_pallas import (
    gather_tile_data,
    raster_tiles_pallas,
)
from mojosplat_tpu.ops.sh import sh_to_color
from mojosplat_tpu.ops.slice_pallas import segment_slice_gather

ITERS = 10
H, W, n, sh = 1080, 1920, 1_000_000, 3

base = RenderConfig(tile_capacity=512, chunk_size=64, tile_batch=512,
                    max_tile_span=8, raster_impl="pallas", pallas_chunk=128,
                    pallas_tiles_per_step=4, grad_route_bf16=True)
camera = Camera.create(R=jnp.eye(3), T=jnp.zeros(3), H=H, W=W,
                       fx=0.5 * W, fy=0.5 * W, cx=W / 2, cy=H / 2)
params = mtrain.activate(
    mtrain.init_gaussians(jax.random.PRNGKey(0), n, sh_degree=sh,
                          position_scale=2.0)
)
th, tw = num_tiles(H, W, base.tile_size)


@jax.jit
def _precompute(params, camera):
    colors = sh_to_color(params["features"], params["means3d"],
                         camera.position, sh)
    proj = project_gaussians = None
    from mojosplat_tpu.ops.projection import project_gaussians
    proj = project_gaussians(params["means3d"], params["scales"],
                             params["quats"], params["opacities"], camera,
                             base)
    binning = bin_gaussians_to_tiles(proj.means2d, proj.radii, proj.depths,
                                     H, W, base)
    ranges = binning.tile_ranges.reshape(-1, 2)
    counts = jnp.clip(ranges[:, 1] - ranges[:, 0], 0,
                      base.tile_capacity).astype(jnp.int32)
    slot_gids = segment_slice_gather(binning.gaussian_ids, ranges[:, 0],
                                     base.tile_capacity)
    pdata = gather_tile_data(proj.means2d, proj.conics, colors,
                             params["opacities"], slot_gids,
                             route_bf16=base.grad_route_bf16)
    return counts, pdata


counts, pdata = jax.block_until_ready(_precompute(params, camera))
print("precompute done", flush=True)


def timed(tag, cfg, grad):
    def stage(pdata, counts):
        out = raster_tiles_pallas(pdata, counts, cfg.tile_size, tw, cfg)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def one(args):
        if grad:
            return jnp.sum(jax.grad(stage)(*args))
        return stage(*args)

    def loop(args, iters):
        def body(c, _):
            a = (args[0] + c * 0.0, args[1])
            return one(a), None

        out, _ = jax.lax.scan(body, 0.0, None, length=iters)
        return out

    fn = jax.jit(functools.partial(loop, iters=ITERS))
    fn1 = jax.jit(functools.partial(loop, iters=1))
    args = (pdata, counts)
    float(fn1(args)); float(fn(args))
    t0 = time.perf_counter(); float(fn1(args)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(fn(args)); tN = time.perf_counter() - t0
    print(f"{tag:34s} {(tN - t1) / (ITERS - 1) * 1000:8.2f} ms", flush=True)


import sys

CONFIGS = [(4, 128), (8, 128), (2, 128), (4, 256), (4, 64)]
if len(sys.argv) > 1:  # "tps:K,tps:K,..."
    CONFIGS = [tuple(int(v) for v in c.split(":"))
               for c in sys.argv[1].split(",")]

for tps, chunk in CONFIGS:
    cfg = dataclasses.replace(base, pallas_tiles_per_step=tps,
                              pallas_chunk=chunk)
    try:
        timed(f"fwdbwd tps={tps} K={chunk}", cfg, grad=True)
    except Exception as e:  # noqa: BLE001 — sweep survives bad configs
        print(f"tps={tps} K={chunk} failed: {type(e).__name__}: {e}",
              flush=True)
