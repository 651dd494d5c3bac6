"""Binning-internals profile at headline scale (pallas route, current design).

Times cumulative dependency slices of bin_gaussians_to_tiles; XLA DCE means
each row costs only what its returned outputs need, so stage cost is the
difference between adjacent rows (and independent slices stand alone).

Groups (one per process; sort compiles at 4M are slow on this machine):
  a: aabb, presort   b: expand, tilemath   c: sort, all
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp

from mojosplat_tpu import Camera, RenderConfig
from mojosplat_tpu import train as mtrain
from mojosplat_tpu.ops.binning import isect_capacity, num_tiles
from mojosplat_tpu.ops.expand_pallas import segment_expand_offsets
from mojosplat_tpu.ops.projection import project_gaussians

ITERS = 10
cfg = RenderConfig(tile_capacity=512, chunk_size=64, tile_batch=512,
                   max_tile_span=8, raster_impl="pallas", pallas_chunk=128)
H, W, n = 1080, 1920, 1_000_000
camera = Camera.create(R=jnp.eye(3), T=jnp.zeros(3), H=H, W=W,
                       fx=0.5 * W, fy=0.5 * W, cx=W / 2, cy=H / 2)
params = mtrain.activate(
    mtrain.init_gaussians(jax.random.PRNGKey(0), n, sh_degree=0,
                          position_scale=2.0)
)
proj = project_gaussians(params["means3d"], params["scales"], params["quats"],
                         params["opacities"], camera, cfg)
ts = cfg.tile_size
span = cfg.max_tile_span
th, tw = num_tiles(H, W, ts)
n_tiles = th * tw
capacity = isect_capacity(n, cfg)


def stages(means2d, radii, depths, upto):
    x, y = means2d[:, 0], means2d[:, 1]
    rx = radii[:, 0].astype(means2d.dtype)
    ry = radii[:, 1].astype(means2d.dtype)
    valid = (radii[:, 0] > 0) & (radii[:, 1] > 0)
    tx_min = jnp.clip(jnp.floor((x - rx) / ts), 0, tw).astype(jnp.int32)
    tx_max = jnp.clip(jnp.ceil((x + rx) / ts), 0, tw).astype(jnp.int32)
    ty_min = jnp.clip(jnp.floor((y - ry) / ts), 0, th).astype(jnp.int32)
    ty_max = jnp.clip(jnp.ceil((y + ry) / ts), 0, th).astype(jnp.int32)
    span_x = jnp.where(valid, tx_max - tx_min, 0)
    span_y = jnp.where(valid, ty_max - ty_min, 0)
    excess_x = jnp.maximum(span_x - span, 0)
    excess_y = jnp.maximum(span_y - span, 0)
    tx_min = tx_min + excess_x // 2
    ty_min = ty_min + excess_y // 2
    span_x = jnp.minimum(span_x, span)
    span_y = jnp.minimum(span_y, span)
    counts = span_x * span_y
    if upto == "aabb":
        return (counts,)

    _, _, counts_p, span_x_p, tx_min_p, ty_min_p, index_p = jax.lax.sort(
        (
            (counts == 0).astype(jnp.int32),
            depths.astype(jnp.float32),
            counts.astype(jnp.float32),
            span_x.astype(jnp.float32),
            tx_min.astype(jnp.float32),
            ty_min.astype(jnp.float32),
            jnp.arange(n, dtype=jnp.float32),
        ),
        num_keys=2,
        is_stable=True,
    )
    offsets_p = jnp.cumsum(counts_p) - counts_p
    total = (offsets_p[-1] + counts_p[-1]).astype(jnp.int32)
    if upto == "presort":
        return (offsets_p, index_p)

    fields_t = jnp.stack(
        [offsets_p, span_x_p, tx_min_p, ty_min_p, index_p], axis=0
    )
    g = segment_expand_offsets(fields_t, capacity)[:, :capacity]
    if upto == "expand":
        return (g,)

    slot = jnp.arange(capacity, dtype=jnp.int32)
    in_range = slot < total
    g_off = g[0].astype(jnp.int32)
    sx = jnp.maximum(g[1].astype(jnp.int32), 1)
    k = slot - g_off
    ky = k // sx
    kx = k - ky * sx
    tile_buf = jnp.where(
        in_range,
        (g[3].astype(jnp.int32) + ky) * tw + g[2].astype(jnp.int32) + kx,
        n_tiles,
    )
    gid_buf = jnp.where(in_range, g[4].astype(jnp.int32), -1)
    if upto == "tilemath":
        return (tile_buf, gid_buf)

    sorted_tile, sorted_gid = jax.lax.sort(
        (tile_buf, gid_buf), num_keys=1, is_stable=True
    )
    if upto == "sort":
        return (sorted_tile, sorted_gid)

    boundaries = jnp.searchsorted(
        sorted_tile, jnp.arange(n_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    return (sorted_tile, sorted_gid, boundaries)


def amortized(name, fn, *args):
    def loop(a, iters):
        def body(c, _):
            a2 = [xx + c * 0.0 if jnp.issubdtype(xx.dtype, jnp.floating)
                  else xx for xx in a]
            out = fn(*a2)
            return sum(jnp.sum(o.astype(jnp.float32)[:3]) for o in out) * 0.0, None

        out, _ = jax.lax.scan(body, 0.0, None, length=iters)
        return out

    f = jax.jit(functools.partial(loop, iters=ITERS))
    f1 = jax.jit(functools.partial(loop, iters=1))
    float(f1(args)); float(f(args))
    t0 = time.perf_counter(); float(f1(args)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(f(args)); tN = time.perf_counter() - t0
    dt = (tN - t1) / (ITERS - 1)
    print(f"{name:24s} {dt*1000:8.2f} ms", flush=True)


GROUPS = {
    "a": ("aabb", "presort"),
    "b": ("expand", "tilemath"),
    "c": ("sort", "all"),
}
for upto in GROUPS[sys.argv[1] if len(sys.argv) > 1 else "a"]:
    amortized(f"upto {upto}",
              functools.partial(stages, upto=upto),
              proj.means2d, proj.radii, proj.depths)
