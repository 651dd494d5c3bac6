"""Cumulative pipeline profile: each row adds one stage (all downstream of
perturbed float inputs, so nothing can be hoisted out of the timing loop)."""
import time, functools
import jax, jax.numpy as jnp
from mojosplat_tpu import Camera, RenderConfig
from mojosplat_tpu import train as mtrain
from mojosplat_tpu.ops.binning import bin_gaussians_to_tiles, num_tiles
from mojosplat_tpu.ops.projection import project_gaussians
from mojosplat_tpu.ops.raster_pallas import gather_tile_data, raster_tiles_pallas
from mojosplat_tpu.ops.rasterization import build_tile_table
from mojosplat_tpu.ops.sh import sh_to_color

ITERS = 20
cfg = RenderConfig(tile_capacity=512, chunk_size=64, tile_batch=512,
                   max_tile_span=8, raster_impl="pallas", pallas_chunk=128)
H, W, n, sh = 600, 800, 100_000, 3
camera = Camera.create(R=jnp.eye(3), T=jnp.zeros(3), H=H, W=W,
                       fx=0.5*W, fy=0.5*W, cx=W/2, cy=H/2)
params = mtrain.activate(mtrain.init_gaussians(jax.random.PRNGKey(0), n, sh_degree=sh, position_scale=2.0))
th, tw = num_tiles(H, W, cfg.tile_size)

def upto(stage, p, cam):
    colors = sh_to_color(p["features"], p["means3d"], cam.position, sh)
    proj = project_gaussians(p["means3d"], p["scales"], p["quats"], p["opacities"], cam, cfg)
    if stage == "proj":
        return (proj.means2d, proj.conics, proj.depths, colors)
    binning = bin_gaussians_to_tiles(proj.means2d, proj.radii, proj.depths, H, W, cfg)
    if stage == "binning":
        return (binning.gaussian_ids, binning.tile_ids, proj.means2d)
    table, ovf = build_tile_table(binning, cfg.tile_capacity)
    if stage == "table":
        return (table, proj.means2d)
    pdata = gather_tile_data(proj.means2d, proj.conics, colors, p["opacities"], table)
    if stage == "gather":
        return (pdata,)
    ranges = binning.tile_ranges.reshape(-1, 2)
    counts = jnp.clip(ranges[:,1]-ranges[:,0], 0, cfg.tile_capacity).astype(jnp.int32)
    out = raster_tiles_pallas(pdata, counts, cfg.tile_size, tw, cfg)
    return (out,)

def timeloop(name, stage, grad=False):
    def one(p, cam):
        outs = upto(stage, p, cam)
        return sum(jnp.sum(jnp.abs(o.astype(jnp.float32))) for o in outs)
    def one_g(p, cam):
        g = jax.grad(lambda q: sum(jnp.sum(o.astype(jnp.float32)**2) for o in upto(stage, q, cam)))(p)
        return sum(jnp.sum(v) for v in g.values())
    f = one_g if grad else one
    def loop(p, cam, iters):
        def body(c, _):
            q = dict(p); q["means3d"] = p["means3d"] + c * 0.0
            return f(q, cam), None
        out, _ = jax.lax.scan(body, 0.0, None, length=iters)
        return out
    fn = jax.jit(functools.partial(loop, iters=ITERS)); fn1 = jax.jit(functools.partial(loop, iters=1))
    float(fn1(params, camera)); float(fn(params, camera))
    t0=time.perf_counter(); float(fn1(params, camera)); t1=time.perf_counter()-t0
    t0=time.perf_counter(); float(fn(params, camera)); tN=time.perf_counter()-t0
    print(f'{name:30s} {(tN-t1)/(ITERS-1)*1000:8.2f} ms')

timeloop("fwd upto proj", "proj")
timeloop("fwd upto binning", "binning")
timeloop("fwd upto table", "table")
timeloop("fwd upto gather", "gather")
timeloop("fwd upto raster", "raster")



