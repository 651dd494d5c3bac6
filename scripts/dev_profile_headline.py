"""Per-stage device-time profile at the HEADLINE workload (1M, 1080p, SH3).

Mirrors dev_profile.py but at bench.py's preset-4 config, decomposed the way
the production pallas path actually runs (segment_slice_gather, bf16 grad
route). See dev_bench.py header for this machine's TPU measurement rules.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp

from mojosplat_tpu import Camera, RenderConfig
from mojosplat_tpu import train as mtrain
from mojosplat_tpu.ops.binning import bin_gaussians_to_tiles, num_tiles
from mojosplat_tpu.ops.projection import project_gaussians
from mojosplat_tpu.ops.raster_pallas import (
    gather_tile_data,
    raster_tiles_pallas,
)
from mojosplat_tpu.ops.sh import sh_to_color
from mojosplat_tpu.ops.slice_pallas import segment_slice_gather

ITERS = 10

# Stage group to profile this run ("pre" | "mid" | "raster"); one group per
# process keeps each run under this machine's 570 s TPU command budget
# (every amortized() entry costs two 1M/1080p jit compiles).
GROUP = (sys.argv[1] if len(sys.argv) > 1 else "raster")

cfg = RenderConfig(tile_capacity=512, chunk_size=64, tile_batch=512,
                   max_tile_span=8, raster_impl="pallas", pallas_chunk=256,
                   pallas_tiles_per_step=8, grad_route_bf16=True)
H, W, n, sh = 1080, 1920, 1_000_000, 3
camera = Camera.create(R=jnp.eye(3), T=jnp.zeros(3), H=H, W=W,
                       fx=0.5 * W, fy=0.5 * W, cx=W / 2, cy=H / 2)
params = mtrain.activate(
    mtrain.init_gaussians(jax.random.PRNGKey(0), n, sh_degree=sh,
                          position_scale=2.0)
)
th, tw = num_tiles(H, W, cfg.tile_size)


def amortized(name, stage_fn, *args, grad_of=None):
    def one(args):
        if grad_of is None:
            out = stage_fn(*args)
            return sum(
                jnp.sum(jnp.abs(x.astype(jnp.float32)))
                for x in jax.tree_util.tree_leaves(out)
            )
        g = jax.grad(
            lambda *a: sum(
                jnp.sum(x.astype(jnp.float32) ** 2)
                for x in jax.tree_util.tree_leaves(stage_fn(*a))
            ),
            argnums=grad_of,
        )(*args)
        return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))

    def loop(args, iters):
        def body(c, _):
            perturbed = jax.tree_util.tree_map(
                lambda x: x + c * 0.0
                if jnp.issubdtype(x.dtype, jnp.floating)
                else x,
                args,
            )
            return one(perturbed), None

        out, _ = jax.lax.scan(body, 0.0, None, length=iters)
        return out

    fn = jax.jit(functools.partial(loop, iters=ITERS))
    fn1 = jax.jit(functools.partial(loop, iters=1))
    float(fn1(args)); float(fn(args))
    t0 = time.perf_counter(); float(fn1(args)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(fn(args)); tN = time.perf_counter() - t0
    dt = (tN - t1) / (ITERS - 1)
    print(f"{name:34s} {dt*1000:8.2f} ms", flush=True)


# Precompute stage inputs once — inside ONE jit: eager execution dispatches
# every op separately through the ~30 ms tunnel (the eager form of this
# section ran 9+ minutes without finishing).
@jax.jit
def _precompute(params, camera):
    colors = sh_to_color(params["features"], params["means3d"],
                         camera.position, sh)
    proj = project_gaussians(params["means3d"], params["scales"],
                             params["quats"], params["opacities"], camera,
                             cfg)
    binning = bin_gaussians_to_tiles(proj.means2d, proj.radii, proj.depths,
                                     H, W, cfg)
    ranges = binning.tile_ranges.reshape(-1, 2)
    counts = jnp.clip(ranges[:, 1] - ranges[:, 0], 0,
                      cfg.tile_capacity).astype(jnp.int32)
    slot_gids = segment_slice_gather(binning.gaussian_ids, ranges[:, 0],
                                     cfg.tile_capacity)
    pdata = gather_tile_data(proj.means2d, proj.conics, colors,
                             params["opacities"], slot_gids,
                             route_bf16=cfg.grad_route_bf16)
    return colors, proj, binning, ranges, counts, slot_gids, pdata


colors, proj, binning, ranges, counts, slot_gids, pdata = jax.block_until_ready(
    _precompute(params, camera))
print("mean count/tile:", float(counts.mean()), " max:", int(counts.max()),
      " isects:", int(binning.aux.num_isects), flush=True)

if GROUP == "pre":
    amortized("sh_to_color fwd", lambda f, m, p: sh_to_color(f, m, p, sh),
              params["features"], params["means3d"], camera.position)
    amortized("sh_to_color fwd+bwd",
              lambda f, m, p: sh_to_color(f, m, p, sh),
              params["features"], params["means3d"], camera.position,
              grad_of=(0, 1))
    amortized("projection fwd",
              lambda m, s, q, o, cam: project_gaussians(m, s, q, o, cam, cfg),
              params["means3d"], params["scales"], params["quats"],
              params["opacities"], camera)
    amortized("projection fwd+bwd",
              lambda m, s, q, o, cam: project_gaussians(
                  m, s, q, o, cam, cfg)[:3],
              params["means3d"], params["scales"], params["quats"],
              params["opacities"], camera, grad_of=(0, 1, 2, 3))
elif GROUP == "mid1":
    amortized("binning fwd",
              lambda m2, r, d: bin_gaussians_to_tiles(m2, r, d, H, W, cfg),
              proj.means2d, proj.radii, proj.depths)
    amortized("slice slot_gids",
              lambda g, s: segment_slice_gather(g, s, cfg.tile_capacity),
              binning.gaussian_ids, ranges[:, 0])
elif GROUP == "mid2":
    amortized("gather fwd",
              lambda m2, c, cl, o, t: gather_tile_data(
                  m2, c, cl, o, t, route_bf16=cfg.grad_route_bf16),
              proj.means2d, proj.conics, colors, params["opacities"],
              slot_gids)
elif GROUP == "mid3":
    amortized("gather fwd+bwd",
              lambda m2, c, cl, o, t: gather_tile_data(
                  m2, c, cl, o, t, route_bf16=cfg.grad_route_bf16),
              proj.means2d, proj.conics, colors, params["opacities"],
              slot_gids, grad_of=(0, 1, 2, 3))
elif GROUP == "raster":
    amortized("pallas raster fwd",
              lambda g, n_: raster_tiles_pallas(g, n_, cfg.tile_size, tw, cfg),
              pdata, counts)
elif GROUP == "raster_bwd":
    amortized("pallas raster fwd+bwd",
              lambda g, n_: raster_tiles_pallas(g, n_, cfg.tile_size, tw, cfg),
              pdata, counts, grad_of=(0,))
else:
    raise SystemExit(f"unknown group {GROUP!r}")
