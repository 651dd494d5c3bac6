"""MEASURED DEAD END (round 4): fast_sigma MXU sigma evaluation.

Result on the v5e at headline raster scale (1M/1080p/SH3, chunk 256,
tiles/step 8):

    fwd max |exact - fast| = 1.157e-03 (image scale 0.795)
    raster fwd [exact]                    25.85 ms
    raster fwd+bwd [exact]                56.72 ms
    raster fwd [fast_sigma]               26.08 ms
    raster fwd+bwd [fast_sigma]           57.79 ms

Moving the per-(pixel, gaussian) sigma chain onto the MXU as a tile-local
quadratic-basis dot changed nothing (<1%) and cost ~1e-3 absolute image
error from f32 cancellation, so the config knob was removed; the kernel is
not bound by the sigma arithmetic. scripts/dev_kernel_probe.py attributes
where the time actually goes. This file is kept as the measurement record;
the fast-mode kernel path it exercised no longer exists.
"""

raise SystemExit(__doc__)


import functools
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

BASE = dict(tile_capacity=512, chunk_size=64, tile_batch=512,
            max_tile_span=8, raster_impl="pallas", pallas_chunk=256,
            pallas_tiles_per_step=8, grad_route_bf16=True)
H, W, n, sh = 1080, 1920, 1_000_000, 3
camera = Camera.create(R=jnp.eye(3), T=jnp.zeros(3), H=H, W=W,
                       fx=0.5 * W, fy=0.5 * W, cx=W / 2, cy=H / 2)
params = mtrain.activate(
    mtrain.init_gaussians(jax.random.PRNGKey(0), n, sh_degree=sh,
                          position_scale=2.0)
)
cfg0 = RenderConfig(**BASE)
th, tw = num_tiles(H, W, cfg0.tile_size)


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


@jax.jit
def _precompute(params, camera):
    colors = sh_to_color(params["features"], params["means3d"],
                         camera.position, sh)
    proj = project_gaussians(params["means3d"], params["scales"],
                             params["quats"], params["opacities"], camera,
                             cfg0)
    binning = bin_gaussians_to_tiles(proj.means2d, proj.radii, proj.depths,
                                     H, W, cfg0)
    ranges = binning.tile_ranges.reshape(-1, 2)
    counts = jnp.clip(ranges[:, 1] - ranges[:, 0], 0,
                      cfg0.tile_capacity).astype(jnp.int32)
    slot_gids = segment_slice_gather(binning.gaussian_ids, ranges[:, 0],
                                     cfg0.tile_capacity)
    pdata = gather_tile_data(proj.means2d, proj.conics, colors,
                             params["opacities"], slot_gids,
                             route_bf16=cfg0.grad_route_bf16)
    return counts, pdata


counts, pdata = jax.block_until_ready(_precompute(params, camera))

# Parity of the two modes on the real MXU (the interpret-mode check cannot
# see hardware dot rounding).
cfg1 = RenderConfig(**BASE, fast_sigma=True)


@jax.jit
def both(pdata, counts):
    a = raster_tiles_pallas(pdata, counts, cfg0.tile_size, tw, cfg0)
    b = raster_tiles_pallas(pdata, counts, cfg0.tile_size, tw, cfg1)
    return jnp.max(jnp.abs(a - b)), jnp.max(jnp.abs(a))

diff, scale = both(pdata, counts)
print(f"fwd max |exact - fast| = {float(diff):.3e} (scale {float(scale):.3f})",
      flush=True)

for label, cfg in (("exact", cfg0), ("fast_sigma", cfg1)):
    amortized(f"raster fwd [{label}]",
              lambda g, n_, cfg=cfg: raster_tiles_pallas(
                  g, n_, cfg.tile_size, tw, cfg),
              pdata, counts)
    amortized(f"raster fwd+bwd [{label}]",
              lambda g, n_, cfg=cfg: raster_tiles_pallas(
                  g, n_, cfg.tile_size, tw, cfg),
              pdata, counts, grad_of=(0,))
