"""Record real-TPU Pallas-vs-XLA parity as an auditable artifact.

Runs both primitive families at 100k gaussians @ 800x600 on the device and
writes PARITY_r{N}.json with forward image and per-parameter gradient
deltas, for (a) the exact f32 gradient route and (b) the bf16 fast
gradient route. One process; run on the TPU:

  python -c "import runpy, sys; sys.argv=['x','PARITY_r04.json'];
             runpy.run_path('scripts/record_parity.py', run_name='__main__')"
"""

import json
import sys

import jax
import jax.numpy as jnp

from mojosplat_tpu import Camera, RenderConfig, render_gaussians
from mojosplat_tpu import train as mtrain
from mojosplat_tpu.surfel import render_surfels

H, W, N = 600, 800, 100_000
OUT = sys.argv[1] if len(sys.argv) > 1 else "PARITY_r04.json"

KW = dict(tile_capacity=512, chunk_size=64, tile_batch=512, max_tile_span=8)
# Round-5 production variant: 32x32 tiles + tight conic culling (the
# headline preset's configuration) — parity recorded separately because it
# exercises different kernel shapes and the mask-decode slot path.
KW32 = dict(tile_capacity=512, chunk_size=64, tile_batch=512,
            max_tile_span=4, tile_size=32, tight_cull=True,
            isect_padding_multiplier=4)


def config(impl, bf16=False, kw=KW, chunk=128, tps=8):
    return RenderConfig(**kw, raster_impl=impl, pallas_chunk=chunk,
                        pallas_tiles_per_step=tps, grad_route_bf16=bf16)


def family(render, params, sh_degree, kw=KW, chunk=128, tps=8):
    cam = Camera.create(R=jnp.eye(3), T=jnp.zeros(3), H=H, W=W,
                        fx=0.5 * W, fy=0.5 * W, cx=W / 2, cy=H / 2)
    bg = jnp.array([0.2, 0.1, 0.3])

    def fwd(p, cam, cfg):
        return render(p["means3d"], p["scales"], p["quats"],
                      p["opacities"], p["features"], cam,
                      sh_degree=sh_degree, background_color=bg, config=cfg)

    import functools

    cfg = functools.partial(config, kw=kw, chunk=chunk, tps=tps)

    @jax.jit
    def run(p, cam):
        ix = fwd(p, cam, cfg("xla"))
        ip = fwd(p, cam, cfg("pallas"))
        fwd_diff = jnp.max(jnp.abs(ix - ip))
        fwd_scale = jnp.max(jnp.abs(ix))
        # Threshold-flip diagnostic: a slot whose alpha lands within f32
        # noise of alpha_threshold (1/255) is kept by one implementation
        # and dropped by the other, producing an isolated O(alpha*color*T)
        # ~ 1e-3 pixel diff. A tiny flipped-pixel count alongside a much
        # smaller p99.9 confirms max-abs outliers are flips, not a
        # systematic numerics gap (the 2DGS alpha chain — ray-plane solve
        # with a det division — flips more often than the 3DGS conic).
        adiff = jnp.abs(ix - ip)
        fwd_p999 = jnp.percentile(adiff, 99.9)
        fwd_flips = jnp.sum(adiff > 1e-5)

        def loss(p, cfg):
            return jnp.mean(fwd(p, cam, cfg) ** 2)

        gx = jax.grad(loss)(p, cfg("xla"))
        gp = jax.grad(loss)(p, cfg("pallas"))
        gf = jax.grad(loss)(p, cfg("pallas", bf16=True))
        rel = lambda a, b: {
            k: jnp.max(jnp.abs(a[k] - b[k]))
            / jnp.maximum(jnp.max(jnp.abs(b[k])), 1e-30)
            for k in b
        }
        return (fwd_diff, fwd_scale, fwd_p999, fwd_flips,
                rel(gp, gx), rel(gf, gx))

    (fwd_diff, fwd_scale, fwd_p999, fwd_flips, rel_exact,
     rel_bf16) = run(params, cam)
    return {
        "fwd_max_abs_diff": float(fwd_diff),
        "fwd_image_scale": float(fwd_scale),
        "fwd_p999_abs_diff": float(fwd_p999),
        "fwd_pixels_above_1e5": int(fwd_flips),
        "grad_max_rel_exact": {k: float(v) for k, v in rel_exact.items()},
        "grad_max_rel_bf16_route": {k: float(v) for k, v in rel_bf16.items()},
    }


def main():
    import os
    import subprocess

    params = mtrain.activate(
        mtrain.init_gaussians(jax.random.PRNGKey(0), N, sh_degree=2,
                              position_scale=2.0)
    )
    # Resumable: each family's record is flushed to OUT as soon as it is
    # measured, so a crash in the second compile keeps the first result.
    # Resume only applies to results recorded at the SAME git revision —
    # otherwise a stale measurement from an older kernel could silently be
    # relabeled as current (round-4 advisor finding).
    try:
        rev = subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
            check=True, cwd=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))).stdout.strip()
    except Exception:
        rev = "unknown"
    rec = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            rec = json.load(f)
        if rec.get("git_rev") != rev:
            print(f"discarding stale results in {OUT} "
                  f"(recorded at {rec.get('git_rev')}, HEAD is {rev})",
                  flush=True)
            rec = {}
    rec.update({
        "git_rev": rev,
        "workload": f"{N} gaussians @ {W}x{H}, SH2, span 8, cap 512",
        "device": jax.devices()[0].device_kind,
        "note": "forward blend uses the 3-pass bf16-split dot "
                "(raster_pallas._dot3) in both kernel families",
    })

    def flush():
        with open(OUT, "w") as f:
            json.dump(rec, f, indent=1)
        print("wrote", OUT, flush=True)

    only = sys.argv[2] if len(sys.argv) > 2 else None
    if only in (None, "3dgs") and "3dgs" not in rec:
        rec["3dgs"] = family(render_gaussians, params, 2)
        print(json.dumps(rec["3dgs"], indent=1), flush=True)
        flush()
    if only in (None, "2dgs") and "2dgs" not in rec:
        sparams = dict(params)
        sparams["scales"] = params["scales"][:, :2]
        rec["2dgs"] = family(render_surfels, sparams, 2)
        print(json.dumps(rec["2dgs"], indent=1), flush=True)
        flush()
    if only in (None, "3dgs_ts32_tight") and "3dgs_ts32_tight" not in rec:
        rec["3dgs_ts32_tight"] = family(
            render_gaussians, params, 2, kw=KW32, chunk=128, tps=2
        )
        print(json.dumps(rec["3dgs_ts32_tight"], indent=1), flush=True)
        flush()


if __name__ == "__main__":
    main()
