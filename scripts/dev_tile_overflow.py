"""Quantify the headline bench's tile_capacity=512 drop (VERDICT r4 #8).

Of the 4.0M slots that survive global capacity on the headline scene,
~532k more are dropped by the per-tile cap (tile_capacity=512,
BENCH_r04.json tile_overflow). This measures what that costs: for
tile_capacity in {512, 1024, 2048} at the exact headline workload
(1M random-init gaussians @ 1080p SH3, every other budget unchanged),
record

  - forward image PSNR vs the tile_capacity=2048 render (the within-
    kept-set anchor: same global capacity, no per-tile drop),
  - fwd+bwd step time (amortized in-jit scan, tunnel-safe),
  - the drop counters.

One process; params uploaded once. Launch detached on the TPU:
  setsid nohup python -c "import runpy; runpy.run_path(
      'scripts/dev_tile_overflow.py', run_name='__main__')" \
      > /tmp/tile_overflow.log 2>&1 &
"""

import functools
import json
import time

import jax
import jax.numpy as jnp

from mojosplat_tpu import Camera, RenderConfig, render_gaussians
from mojosplat_tpu import train as mtrain

N, H, W, SH = 1_000_000, 1080, 1920, 3
CAPS = (512, 1024, 2048)
ITERS = 6


def make_config(tile_capacity):
    return RenderConfig(
        tile_capacity=tile_capacity, chunk_size=64, tile_batch=512,
        max_tile_span=8, raster_impl="pallas", pallas_chunk=256,
        pallas_tiles_per_step=8, grad_route_bf16=True,
    )


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

    def forward_img(p, cam, config):
        img, aux = render_gaussians(
            p["means3d"], p["scales"], p["quats"], p["opacities"],
            p["features"], cam, sh_degree=SH, background_color=bg,
            config=config, return_aux=True,
        )
        return img, (aux.binning.num_isects, aux.raster.tile_overflow)

    def loop(p, cam, config, iters):
        def body(carry, _):
            q = dict(p)
            q["means3d"] = p["means3d"] + carry * 0.0

            def scalar(pp):
                img, _ = forward_img(pp, cam, config)
                return jnp.mean(img ** 2)

            g = jax.grad(lambda m: scalar({**q, "means3d": m}))(q["means3d"])
            return jnp.sum(g), None

        out, _ = jax.lax.scan(body, 0.0, None, length=iters)
        return out

    results = {}
    images = {}
    for cap in CAPS:
        config = make_config(cap)
        t0 = time.time()
        img, counters = jax.jit(
            functools.partial(forward_img, config=config)
        )(params, camera)
        jax.block_until_ready(img)
        images[cap] = img
        num_isects, tile_of = (int(c) for c in counters)
        print(f"cap={cap}: fwd compiled+ran in {time.time()-t0:.1f}s, "
              f"num_isects={num_isects}, tile_overflow={tile_of}",
              flush=True)

        f1 = jax.jit(functools.partial(loop, config=config, iters=1))
        fN = jax.jit(functools.partial(loop, config=config, iters=ITERS))
        float(f1(params, camera))
        float(fN(params, camera))
        t0 = time.perf_counter()
        float(f1(params, camera))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(fN(params, camera))
        tN = time.perf_counter() - t0
        step_ms = (tN - t1) / (ITERS - 1) * 1e3
        results[cap] = {
            "num_isects": num_isects,
            "tile_overflow": tile_of,
            "step_ms": round(step_ms, 2),
        }
        print(f"cap={cap}: step {step_ms:.2f} ms", flush=True)

    anchor = images[CAPS[-1]]
    for cap in CAPS:
        mse = float(jnp.mean((images[cap] - anchor) ** 2))
        psnr = (float("inf") if mse < 1e-12
                else float(10.0 * jnp.log10(1.0 / mse)))
        results[cap]["psnr_vs_cap2048"] = round(psnr, 2)

    print(json.dumps({"workload": f"{N} @ {H}x{W} SH{SH} (headline)",
                      "results": {str(k): v for k, v in results.items()}}),
          flush=True)


if __name__ == "__main__":
    main()
