"""Sweep (pallas_tiles_per_step, pallas_chunk) on the 2DGS surfel raster
stage ONLY (fwd+bwd, aux-maps kernel variant = the training configuration),
at the headline workload, inside one process so the parameter upload and
the prep happen once. Mirrors dev_sweep_raster.py for the 3DGS family;
see dev_bench.py header for measurement rules.

Usage: python -c "import runpy,sys; sys.argv=['x']; runpy.run_path(
    'scripts/dev_sweep_surfel.py', run_name='__main__')"
Optional argv[1]: "tps:K,tps:K,..."; argv[2]: "plain" to also sweep the
non-aux kernel (preset 4b).
"""

import dataclasses
import functools
import sys
import time

import jax
import jax.numpy as jnp

from mojosplat_tpu import Camera, RenderConfig
from mojosplat_tpu import train as mtrain
from mojosplat_tpu.ops.binning import bin_gaussians_to_tiles, num_tiles
from mojosplat_tpu.ops.projection import project_gaussians
from mojosplat_tpu.ops.sh import sh_to_color
from mojosplat_tpu.ops.slice_pallas import segment_slice_gather
from mojosplat_tpu.ops.surfel_pallas import (
    gather_surfel_tile_data,
    primed_surfel_columns,
    raster_surfel_tiles_pallas,
)
from mojosplat_tpu.surfel import (
    _FILTER_SIGMA2,
    _TINY_LOG_SCALE,
    oriented_normal_columns,
    surfel_alpha_columns,
)

ITERS = 8
H, W, n, sh = 1080, 1920, 1_000_000, 3

base = RenderConfig(tile_capacity=512, chunk_size=64, tile_batch=512,
                    max_tile_span=8, raster_impl="pallas", pallas_chunk=256,
                    pallas_tiles_per_step=8, grad_route_bf16=True)
camera = Camera.create(R=jnp.eye(3), T=jnp.zeros(3), H=H, W=W,
                       fx=0.5 * W, fy=0.5 * W, cx=W / 2, cy=H / 2)
params = mtrain.activate(
    mtrain.init_gaussians(jax.random.PRNGKey(0), n, sh_degree=sh,
                          position_scale=2.0)
)
params["scales"] = params["scales"][:, :2]  # disks
th, tw = num_tiles(H, W, base.tile_size)


@functools.partial(jax.jit, static_argnames=("aux",))
def _precompute(params, camera, aux=True):
    # Same prep as surfel.py's pallas branch: flattened-3D projection
    # bound widened to the low-pass filter's support, binning, per-tile
    # slot gather, primed column pack (+ normals for the aux kernel).
    N = params["means3d"].shape[0]
    scales3 = jnp.concatenate(
        [params["scales"],
         jnp.full((N, 1), _TINY_LOG_SCALE, params["scales"].dtype)],
        axis=-1,
    )
    proj = project_gaussians(params["means3d"], scales3, params["quats"],
                             params["opacities"], camera, base)
    safe_op = jnp.maximum(params["opacities"], base.alpha_threshold)
    filter_r = jnp.ceil(jnp.sqrt(
        2.0 * _FILTER_SIGMA2 * jnp.log(safe_op / base.alpha_threshold)
    )).astype(proj.radii.dtype)
    radii = jnp.where(
        proj.radii > 0, jnp.maximum(proj.radii, filter_r[:, None]),
        proj.radii,
    )
    binning = bin_gaussians_to_tiles(proj.means2d, radii, proj.depths,
                                     H, W, base)
    ranges = binning.tile_ranges.reshape(-1, 2)
    counts = jnp.clip(ranges[:, 1] - ranges[:, 0], 0,
                      base.tile_capacity).astype(jnp.int32)
    slot_gids = segment_slice_gather(binning.gaussian_ids, ranges[:, 0],
                                     base.tile_capacity)
    colors = sh_to_color(params["features"], params["means3d"],
                         camera.position, sh)
    cols = surfel_alpha_columns(params["means3d"], params["scales"],
                                params["quats"], params["opacities"],
                                camera)
    pcols = list(primed_surfel_columns(cols, camera))
    pcols += [colors[:, c] for c in range(colors.shape[-1])]
    if aux:
        pcols += list(oriented_normal_columns(cols))
    pdata = gather_surfel_tile_data(pcols, slot_gids,
                                    route_bf16=base.grad_route_bf16)
    return counts, pdata


def timed(tag, cfg, counts, pdata, aux):
    def stage(pdata, counts):
        out = raster_surfel_tiles_pallas(pdata, counts, cfg.tile_size, tw,
                                         cfg, aux)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def one(args):
        return jnp.sum(jax.grad(stage)(*args))

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
    print(f"{tag:40s} {(tN - t1) / (ITERS - 1) * 1000:8.2f} ms", flush=True)


CONFIGS = [(8, 256), (8, 128), (4, 256), (4, 128), (16, 256), (2, 256)]
if len(sys.argv) > 1 and sys.argv[1]:
    CONFIGS = [tuple(int(v) for v in c.split(":"))
               for c in sys.argv[1].split(",")]
MODES = [True] + ([False] if "plain" in sys.argv[2:] else [])

for aux in MODES:
    counts, pdata = jax.block_until_ready(_precompute(params, camera, aux))
    print(f"precompute done (aux={aux})", flush=True)
    for tps, chunk in CONFIGS:
        cfg = dataclasses.replace(base, pallas_tiles_per_step=tps,
                                  pallas_chunk=chunk)
        try:
            timed(f"fwdbwd aux={aux} tps={tps} K={chunk}", cfg, counts,
                  pdata, aux)
        except Exception as e:  # noqa: BLE001 — sweep survives bad configs
            print(f"aux={aux} tps={tps} K={chunk} failed: "
                  f"{type(e).__name__}: {e}", flush=True)
