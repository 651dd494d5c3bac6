"""Measure the QUALITY cost of the headline bench's static clamps.

The headline config (bench.py preset 4) renders under three work-dropping
budgets: max_tile_span=8 (default 32), intersection capacity 4xN, and
tile_capacity=512. VERDICT r3 flagged that nothing quantifies what those
clamps cost in image/gradient terms. This script renders the SAME bench
scene at a size where an unclamped render fits (250k gaussians @ 1080p,
SH3, per the VERDICT prescription) and reports:

  - PSNR of the clamped image vs the unclamped image
  - relative L2 + cosine agreement of d(loss)/d(means3d) between configs
  - both configs' drop counters (num_isects / capacity_overflow /
    span_truncated / tile_overflow)

Scene note: the raw random-init bench scene is pathological for this
question — its near-camera splats are enormous (unclamped demand ~43M
intersections at 250k gaussians, measured), which no finite buffer honestly
holds. A converged real scene has small splats, so this script clamps the
log-scales (<= log 0.02) to that regime; the headline scene's own keep
fraction is reported separately by bench.py --report-aux.

Run on the TPU (cwd=/root/repo):
  python -c "import runpy; runpy.run_path('scripts/dev_clamp_cost.py', run_name='__main__')"

One process, params uploaded once (CLAUDE.md machine rules).
"""

import json

import jax
import jax.numpy as jnp

from mojosplat_tpu import Camera, RenderConfig, render_gaussians
from mojosplat_tpu import train as mtrain

N, H, W, SH = 250_000, 1080, 1920, 3

CLAMPED = RenderConfig(
    tile_capacity=512, chunk_size=64, tile_batch=512, max_tile_span=8,
    raster_impl="pallas", pallas_chunk=256, pallas_tiles_per_step=8,
    grad_route_bf16=True,
)
# Budgets opened until nothing is dropped (validated by the counters below):
# span back at the default 32, capacity 40xN = 10M slots, tiles to 2048.
UNCLAMPED = RenderConfig(
    tile_capacity=2048, chunk_size=64, tile_batch=512, max_tile_span=32,
    isect_padding_multiplier=40,
    raster_impl="pallas", pallas_chunk=256, pallas_tiles_per_step=8,
    grad_route_bf16=True,
)


def main():
    camera = Camera.create(
        R=jnp.eye(3), T=jnp.zeros(3), H=H, W=W,
        fx=0.5 * W, fy=0.5 * W, cx=W / 2, cy=H / 2,
    )
    raw = mtrain.init_gaussians(jax.random.PRNGKey(0), N, sh_degree=SH,
                                position_scale=2.0)
    raw["scales"] = jnp.minimum(raw["scales"], jnp.log(0.02))
    params = mtrain.activate(raw)

    def run(config):
        def loss_fn(means3d, p, cam):
            img, aux = render_gaussians(
                means3d, p["scales"], p["quats"], p["opacities"],
                p["features"], cam, sh_degree=SH,
                background_color=jnp.array([0.1, 0.1, 0.1]),
                config=config, return_aux=True,
            )
            return jnp.mean(img**2), (img, aux)

        @jax.jit
        def step(p, cam):
            (loss, (img, aux)), g = jax.value_and_grad(
                loss_fn, has_aux=True
            )(p["means3d"], p, cam)
            return img, g, (aux.binning.num_isects,
                            aux.binning.capacity_overflow,
                            aux.binning.span_truncated,
                            aux.raster.tile_overflow)

        img, g, counters = jax.block_until_ready(step(params, camera))
        return img, g, [int(c) for c in counters]

    img_c, g_c, ctr_c = run(CLAMPED)
    print("clamped counters   [isects, cap_of, span_tr, tile_of]:", ctr_c,
          flush=True)
    img_u, g_u, ctr_u = run(UNCLAMPED)
    print("unclamped counters [isects, cap_of, span_tr, tile_of]:", ctr_u,
          flush=True)

    mse = float(jnp.mean((img_c - img_u) ** 2))
    psnr = float(10.0 * jnp.log10(1.0 / max(mse, 1e-12)))
    num = float(jnp.vdot(g_c, g_u))
    cos = num / float(jnp.linalg.norm(g_c) * jnp.linalg.norm(g_u) + 1e-30)
    rel_l2 = float(jnp.linalg.norm(g_c - g_u) / (jnp.linalg.norm(g_u)
                                                 + 1e-30))
    print(json.dumps({
        "n": N, "hw": [H, W], "sh": SH,
        "psnr_clamped_vs_unclamped": round(psnr, 2),
        "grad_cosine": round(cos, 6),
        "grad_rel_l2": round(rel_l2, 6),
        "clamped_counters": ctr_c,
        "unclamped_counters": ctr_u,
    }))


if __name__ == "__main__":
    main()
