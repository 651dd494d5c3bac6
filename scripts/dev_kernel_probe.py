"""Which op chain binds the raster forward kernel? Stripped-variant probe.

The fast_sigma A/B showed the sigma VPU chain is NOT the binding cost
(moving it to the MXU changed nothing). This probe times degenerate
variants of the forward kernel at headline scale to attribute the ~26 ms:

  full    — the real math (sanity: should match raster fwd ~25.9 ms)
  noexp   — exp replaced by a 1-mul polynomial stand-in
  noscan  — no cumprod/exclusive scan/min-reduce (w = alpha * t_in)
  nomask  — no keep/threshold compares (alpha = raw)
  blend   — only the MXU blend matmul of raw rows (no geometry at all)
  memonly — read the chunk, accumulate row sums (DMA/loop floor)

Wrong math everywhere except `full` — timing attribution only.
"""

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mojosplat_tpu import Camera, RenderConfig
from mojosplat_tpu import train as mtrain
from mojosplat_tpu.ops.binning import bin_gaussians_to_tiles, num_tiles
from mojosplat_tpu.ops.projection import project_gaussians
from mojosplat_tpu.ops.raster_pallas import (
    _chunk_rows,
    _lane_col,
    _lane_cumprod,
    _lane_excl,
    _tile_pixel_centers,
    gather_tile_data,
)
from mojosplat_tpu.ops.sh import sh_to_color
from mojosplat_tpu.ops.slice_pallas import segment_slice_gather

ITERS = 10
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
K = cfg.pallas_chunk
ts = cfg.tile_size
P = ts * ts
tps = cfg.pallas_tiles_per_step


def _variant_kernel(counts_ref, pdata_ref, out_ref,
                    t_s, done_s, acc_s, *, variant):
    tt = pl.program_id(0)
    eps = cfg.transmittance_eps
    cap = pdata_ref.shape[1] // tps
    cp = pdata_ref.shape[0] - 6

    for i in range(tps):
        t = tt * tps + i
        count = counts_ref[t]
        px, py = _tile_pixel_centers(t, ts, tw, P)

        t_s[...] = jnp.ones((P, 1), jnp.float32)
        done_s[...] = jnp.zeros((P, 1), jnp.float32)
        acc_s[...] = jnp.zeros((P, cp), jnp.float32)

        for k in range(cap // K):
            guard = (k * K < count) & (jnp.min(done_s[...]) == 0.0)

            @pl.when(guard)
            def _(k=k, i=i, count=count, px=px, py=py):
                t_in = t_s[...]
                done = done_s[...]
                g = _chunk_rows(pdata_ref, i * (cap // K) + k, K)
                col = _lane_col(K)

                if variant == "memonly":
                    acc_s[...] = acc_s[...] + jnp.broadcast_to(
                        jnp.sum(g, axis=0, keepdims=True)[:, :cp], (P, cp)
                    )
                    return
                if variant == "blend":
                    w = jnp.broadcast_to(g[5:6, :], (P, K))
                    acc_s[...] = acc_s[...] + jax.lax.dot_general(
                        w, g[6:, :], (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                    return

                xg, yg = g[0:1, :], g[1:2, :]
                ca, cb, cc, op = g[2:3, :], g[3:4, :], g[4:5, :], g[5:6, :]
                dx = xg - px
                dy = yg - py
                sigma = (0.5 * (ca * dx * dx + cc * dy * dy)
                         + cb * dx * dy)
                if variant == "noexp":
                    e = 1.0 - jnp.minimum(sigma, 1.0) * 0.6
                elif variant == "exp2":
                    e = jnp.exp2(sigma * -1.4426950408889634)
                else:
                    e = jnp.exp(-sigma)
                raw = op * e
                if variant == "nomask":
                    alpha = raw * 0.001  # keep T alive; no compares
                else:
                    alpha = jnp.minimum(raw, cfg.max_alpha)
                    keep = ((sigma >= 0.0)
                            & (alpha >= cfg.alpha_threshold)
                            & (col + k * K < count))
                    alpha = jnp.where(keep, alpha, 0.0)

                if variant == "noscan":
                    w = alpha * t_in
                    acc_s[...] = acc_s[...] + jax.lax.dot_general(
                        w, g[6:, :], (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                    t_s[...] = t_in * 0.999
                    return

                cum = _lane_cumprod(1.0 - alpha, col, K)
                t_after = t_in * cum
                applied = (t_after > eps) & (done == 0.0)
                eff = jnp.where(applied, alpha, 0.0)
                excl = _lane_excl(cum, col, 1.0)
                w = eff * t_in * excl
                cols_t = g[6:, :]
                if variant == "blend3":
                    # Manual 3-pass bf16-split dot: wh@c + wl@c with c also
                    # split on one side; error ~2^-17 rel vs HIGHEST's 6
                    # passes.
                    wh = w.astype(jnp.bfloat16).astype(jnp.float32)
                    wl = w - wh
                    chh = cols_t.astype(jnp.bfloat16).astype(jnp.float32)
                    cll = cols_t - chh
                    dot = lambda a, b: jax.lax.dot_general(
                        a, b, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT,
                    )
                    mm = dot(wh, chh) + dot(wh, cll) + dot(wl, chh)
                elif variant == "blend1":
                    mm = jax.lax.dot_general(
                        w, cols_t, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT,
                    )
                else:
                    mm = jax.lax.dot_general(
                        w, cols_t, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                acc_s[...] = acc_s[...] + mm
                t_s[...] = jnp.min(
                    jnp.where(applied, t_after, t_in), axis=1,
                    keepdims=True,
                )
                done_s[...] = jnp.maximum(
                    done, (t_after[:, K - 1 : K] <= eps).astype(jnp.float32)
                )

        out_ref[i, :, :] = jnp.concatenate(
            [acc_s[...], t_s[...]], axis=1
        ).T


def run_variant(variant, pdata, counts):
    n_tiles = counts.shape[0]
    cap = pdata.shape[1] // n_tiles
    n_pad = -(-n_tiles // tps) * tps
    if n_pad != n_tiles:
        counts = jnp.pad(counts, (0, n_pad - n_tiles))
        pdata = jnp.pad(pdata, ((0, 0), (0, (n_pad - n_tiles) * cap)))
    rows = pdata.shape[0]
    oc = rows - 6 + 1
    kernel = functools.partial(_variant_kernel, variant=variant)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // tps,),
        in_specs=[pl.BlockSpec((rows, tps * cap), lambda t, c: (0, t))],
        out_specs=pl.BlockSpec((tps, oc, P), lambda t, c: (t, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((P, 1), jnp.float32),
            pltpu.VMEM((P, 1), jnp.float32),
            pltpu.VMEM((P, rows - 6), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, oc, P), jnp.float32),
    )(counts, pdata)[:n_tiles]


def amortized(name, fn, *args):
    def loop(args, iters):
        def body(c, _):
            perturbed = jax.tree_util.tree_map(
                lambda x: x + c * 0.0
                if jnp.issubdtype(x.dtype, jnp.floating) else x, args)
            return jnp.sum(jnp.abs(fn(*perturbed))), None

        out, _ = jax.lax.scan(body, 0.0, None, length=iters)
        return out

    f = jax.jit(functools.partial(loop, iters=ITERS))
    f1 = jax.jit(functools.partial(loop, iters=1))
    float(f1(args)); float(f(args))
    t0 = time.perf_counter(); float(f1(args)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(f(args)); tN = time.perf_counter() - t0
    print(f"{name:18s} {(tN - t1) / (ITERS - 1) * 1000:8.2f} ms",
          flush=True)


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
    return counts, pdata


counts, pdata = jax.block_until_ready(_precompute(params, camera))
import sys

VARIANTS = (sys.argv[1].split(",") if len(sys.argv) > 1
            else ["full", "noexp", "noscan", "nomask", "blend", "memonly"])
if "parity" in VARIANTS:
    # Image deltas of the candidate fast paths vs the exact kernel.
    @jax.jit
    def deltas(pdata, counts):
        a = run_variant("full", pdata, counts)
        return (jnp.max(jnp.abs(run_variant("blend3", pdata, counts) - a)),
                jnp.max(jnp.abs(run_variant("blend1", pdata, counts) - a)),
                jnp.max(jnp.abs(run_variant("exp2", pdata, counts) - a)),
                jnp.max(jnp.abs(a)))
    d3, d1, de, s = deltas(pdata, counts)
    print(f"max|blend3-full|={float(d3):.3e} max|blend1-full|={float(d1):.3e}"
          f" max|exp2-full|={float(de):.3e} scale={float(s):.3f}", flush=True)
    VARIANTS.remove("parity")
for v in VARIANTS:
    amortized(v, lambda p, c, v=v: run_variant(v, p, c), pdata, counts)
