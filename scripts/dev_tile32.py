"""Tile-size economics on the headline workload (r5 permutation-floor attack).

The r4 floor analysis (BASELINE.md) puts ~71 ms of the 128.7 ms headline
step in permutation work (binning slot sort + slot field gather + gradient
route sort), all scalar-core bound *per row* at 4.19M slot rows. Rows are
(gaussian, tile) pairs: for the headline's huge splats the row count
scales ~1/ts^2 with tile size while blend work per slot scales ~ts^2 —
so a 32x32 tile at 1/4 the slot capacity holds the blend budget constant
and quarters every permutation term. The 16x16 tile is a CUDA block-size
inheritance (rasterization.mojo:219-220, one thread per pixel); nothing
on TPU prefers it.

Sweeps config variants at the exact headline workload in ONE process
(params uploaded once), appending one JSON line per config to stdout.

Launch detached on the TPU:
  setsid nohup python -c "import runpy; runpy.run_path(
      'scripts/dev_tile32.py', run_name='__main__')" \
      > /tmp/tile32.log 2>&1 &
"""

import functools
import json
import time
import traceback

import jax
import jax.numpy as jnp

from mojosplat_tpu import Camera, RenderConfig, render_gaussians
from mojosplat_tpu import train as mtrain

N, H, W, SH = 1_000_000, 1080, 1920, 3
ITERS = 6

# (label, dict of RenderConfig overrides). The r4 ts16 baseline is NOT
# re-measured here — the same-day dev_tile_overflow run re-confirmed it
# (cap=512: 128.46 ms). Compiles on this backend can take 10+ min each, so
# the sweep is kept to the decisive variants.
CONFIGS = [
    # Sweep 2: refine around the cap640 win (83.2 ms; sweep-1 results in
    # BASELINE.md). The per-tile cap moves both the table-sized
    # gather/route AND the kernels' unrolled chunk count.
    ("ts32-mult1-cap640-k128-tps4", dict(
        tile_size=32, max_tile_span=4, isect_padding_multiplier=1,
        tile_capacity=640, pallas_chunk=128, pallas_tiles_per_step=4)),
    ("ts32-mult1-cap512-k128-tps4", dict(
        tile_size=32, max_tile_span=4, isect_padding_multiplier=1,
        tile_capacity=512, pallas_chunk=128, pallas_tiles_per_step=4)),
    ("ts16-mult4-cap384-k128-tps8", dict(
        tile_size=16, max_tile_span=8, isect_padding_multiplier=4,
        tile_capacity=384, pallas_chunk=128, pallas_tiles_per_step=8)),
    ("ts32-mult1-cap768-k128-tps4", dict(
        tile_size=32, max_tile_span=4, isect_padding_multiplier=1,
        tile_capacity=768, pallas_chunk=128, pallas_tiles_per_step=4)),
]


def main():
    camera = Camera.create(
        R=jnp.eye(3), T=jnp.zeros(3), H=H, W=W,
        fx=0.5 * W, fy=0.5 * W, cx=W / 2, cy=H / 2,
    )
    params = mtrain.activate(
        mtrain.init_gaussians(jax.random.PRNGKey(0), N, sh_degree=SH,
                              position_scale=2.0)
    )
    bg = jnp.array([0.1, 0.1, 0.1])

    def loop(p, cam, config, iters):
        def body(carry, _):
            q = dict(p)
            q["means3d"] = p["means3d"] + carry * 0.0

            def scalar(m):
                img = render_gaussians(
                    m, q["scales"], q["quats"], q["opacities"],
                    q["features"], cam, sh_degree=SH,
                    background_color=bg, config=config,
                )
                return jnp.mean(img ** 2)

            g = jax.grad(scalar)(q["means3d"])
            return jnp.sum(g), None

        out, _ = jax.lax.scan(body, 0.0, None, length=iters)
        return out

    def counters(p, cam, config):
        _, aux = render_gaussians(
            p["means3d"], p["scales"], p["quats"], p["opacities"],
            p["features"], cam, sh_degree=SH, background_color=bg,
            config=config, return_aux=True,
        )
        return (aux.binning.num_isects, aux.binning.capacity_overflow,
                aux.binning.span_truncated, aux.raster.tile_overflow)

    for label, kw in CONFIGS:
        config = RenderConfig(
            chunk_size=64, tile_batch=512, raster_impl="pallas",
            grad_route_bf16=True, **kw,
        )
        try:
            t0 = time.time()
            cnt = [int(c) for c in jax.jit(
                functools.partial(counters, config=config)
            )(params, camera)]
            print(f"{label}: counters {cnt} "
                  f"({time.time()-t0:.0f}s compile+run)", flush=True)
            f1 = jax.jit(functools.partial(loop, config=config, iters=1))
            fN = jax.jit(functools.partial(loop, config=config,
                                           iters=ITERS))
            float(f1(params, camera))
            float(fN(params, camera))
            t0 = time.perf_counter()
            float(f1(params, camera))
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(fN(params, camera))
            tN = time.perf_counter() - t0
            step_ms = (tN - t1) / (ITERS - 1) * 1e3
            # Blend-work-normalized slot count: ts^2-weighted so configs
            # with different tile sizes compare on equal footing.
            work = cnt[0] * kw["tile_size"] ** 2
            print(json.dumps({
                "label": label, "step_ms": round(step_ms, 2),
                "px_per_s": round(H * W / (step_ms / 1e3)),
                "num_isects": cnt[0], "capacity_overflow": cnt[1],
                "span_truncated": cnt[2], "tile_overflow": cnt[3],
                "blend_work_px_slots": work,
            }), flush=True)
        except Exception:
            print(f"{label}: FAILED\n{traceback.format_exc()}", flush=True)


if __name__ == "__main__":
    main()
