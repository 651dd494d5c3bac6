"""Sweep 3: ts32 headline refinement + per-tile-drop PSNR at ts32.

Times cap512-tps2 / cap384-tps4 (edge configs around the sweep-2 winner
cap512-tps4 = 77.4 ms) and renders forward images for cap384/512/1536 to
measure what the per-tile cap drops cost at ts32 granularity (the ts16
study bounded 532k drops at 110 dB; this validates the same at ts32
before the headline preset adopts it).

  setsid nohup python -c "import runpy; runpy.run_path(
      'scripts/dev_tile32c.py', run_name='__main__')" \
      > /tmp/tile32c.log 2>&1 &
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

TIMED = [
    ("ts32-cap512-k128-tps2", dict(tile_capacity=512, pallas_chunk=128,
                                   pallas_tiles_per_step=2)),
    ("ts32-cap384-k128-tps4", dict(tile_capacity=384, pallas_chunk=128,
                                   pallas_tiles_per_step=4)),
]
PSNR_CAPS = (384, 512, 1536)


def make_config(**kw):
    base = dict(
        tile_size=32, max_tile_span=4, isect_padding_multiplier=1,
        chunk_size=64, tile_batch=512, raster_impl="pallas",
        grad_route_bf16=True, pallas_chunk=128, pallas_tiles_per_step=4,
    )
    base.update(kw)
    return RenderConfig(**base)


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
        return img, aux.raster.tile_overflow

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

    for label, kw in TIMED:
        try:
            config = make_config(**kw)
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
            print(json.dumps({"label": label,
                              "step_ms": round(step_ms, 2),
                              "px_per_s": round(H * W / (step_ms / 1e3))}),
                  flush=True)
        except Exception:
            print(f"{label}: FAILED\n{traceback.format_exc()}", flush=True)

    images = {}
    for cap in PSNR_CAPS:
        config = make_config(tile_capacity=cap)
        t0 = time.time()
        img, tile_of = jax.jit(
            functools.partial(forward_img, config=config)
        )(params, camera)
        jax.block_until_ready(img)
        images[cap] = img
        print(f"cap={cap}: fwd ok ({time.time()-t0:.0f}s), "
              f"tile_overflow={int(tile_of)}", flush=True)
    anchor = images[PSNR_CAPS[-1]]
    rep = {}
    for cap in PSNR_CAPS[:-1]:
        mse = float(jnp.mean((images[cap] - anchor) ** 2))
        rep[str(cap)] = (float("inf") if mse < 1e-12
                         else round(10.0 * float(jnp.log10(1.0 / mse)), 2))
    print(json.dumps({"psnr_vs_cap1536_ts32": rep}), flush=True)


if __name__ == "__main__":
    main()
