"""Headline-shape knob sweep: pallas_chunk x tiles_per_step x tile_capacity.

Runs the full fwd+bwd train objective at the bench preset-4 shape for a few
RenderConfig knob combinations and prints amortized ms/step for each — run
ONE combo per process invocation (arg: index) to stay inside this machine's
TPU command budget (each combo costs two 1080p compiles, 40-90 s each).

Usage: python -c "import runpy,sys; sys.argv=['x','<combo>'];
                  runpy.run_path('scripts/dev_sweep.py', run_name='__main__')"
"""

import sys

import jax
import jax.numpy as jnp

from mojosplat_tpu import Camera, RenderConfig, render_gaussians
from mojosplat_tpu import train as mtrain
from mojosplat_tpu.utils.metrics import amortized_ms

COMBOS = {
    # name: (pallas_chunk, tiles_per_step, tile_capacity)
    "base": (128, 4, 512),
    "chunk256": (256, 4, 512),
    "tps8": (128, 8, 512),
    "chunk256_tps8": (256, 8, 512),
    "cap640": (128, 4, 640),
    "chunk64": (64, 4, 512),
}


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "base"
    chunk, tps, cap = COMBOS[name]
    cfg = RenderConfig(
        tile_capacity=cap, chunk_size=64, tile_batch=512, max_tile_span=8,
        raster_impl="pallas", pallas_chunk=chunk, pallas_tiles_per_step=tps,
        grad_route_bf16=True,
    )
    H, W, n, sh = 1080, 1920, 1_000_000, 3
    camera = Camera.create(R=jnp.eye(3), T=jnp.zeros(3), H=H, W=W,
                           fx=0.5 * W, fy=0.5 * W, cx=W / 2, cy=H / 2)
    params = mtrain.activate(
        mtrain.init_gaussians(jax.random.PRNGKey(0), n, sh_degree=sh,
                              position_scale=2.0)
    )

    def step(p, cam):
        g = jax.grad(
            lambda q: jnp.mean(
                render_gaussians(
                    q["means3d"], q["scales"], q["quats"], q["opacities"],
                    q["features"], cam, sh_degree=sh,
                    background_color=jnp.array([0.1, 0.1, 0.1]), config=cfg,
                )
                ** 2
            )
        )(p)
        return sum(jnp.sum(v) for v in g.values())

    ms = amortized_ms(step, (params, camera), iters=8)
    px = H * W / (ms * 1e-3) / 1e6
    print(f"{name}: chunk={chunk} tps={tps} cap={cap} -> "
          f"{ms:.2f} ms/step, {px:.2f} Mpix/s")


if __name__ == "__main__":
    main()
