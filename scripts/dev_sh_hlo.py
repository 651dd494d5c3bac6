"""Compare compiled-cost stats of the headline grad step across SH
normalize variants: 'old' (maximum-guard), 'jvp' (custom_jvp), 'where'
(double-where). Usage: run with runpy, argv[1] = variant.

Diagnosing the round-1->2 regression: 12.1M -> 7.2M pixels/s caused by the
SH dirs sanitize change (commit 71d5123)."""

import sys

import jax
import jax.numpy as jnp

import mojosplat_tpu.ops.sh as shmod
from mojosplat_tpu import Camera, RenderConfig, render_gaussians
from mojosplat_tpu import train as mtrain

variant = sys.argv[1] if len(sys.argv) > 1 else "old"

# eval_sh resolves _safe_normalize from module globals at call time, so
# swapping the module attribute swaps the variant.
if variant == "old":
    def _norm(dirs):
        norm = jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        return dirs / jnp.maximum(norm, 1e-12)
    shmod._safe_normalize = _norm
elif variant == "where":
    def _norm(dirs):
        n2 = jnp.sum(dirs * dirs, axis=-1, keepdims=True)
        ok = n2 > 1e-24
        dirs_safe = jnp.where(ok, dirs, jnp.array([0.0, 0.0, 1.0]))
        n2_safe = jnp.where(ok, n2, 1.0)
        return dirs_safe / jnp.sqrt(n2_safe)
    shmod._safe_normalize = _norm
# else: keep the custom_jvp version as-is.

config = RenderConfig(tile_capacity=512, chunk_size=64, tile_batch=512,
                      max_tile_span=8, raster_impl="pallas",
                      pallas_chunk=128, pallas_tiles_per_step=4,
                      grad_route_bf16=True)
H, W, n, sh = 1080, 1920, 1_000_000, 3
camera = Camera.create(R=jnp.eye(3), T=jnp.zeros(3), H=H, W=W,
                       fx=0.5 * W, fy=0.5 * W, cx=W / 2, cy=H / 2)
params = mtrain.activate(
    mtrain.init_gaussians(jax.random.PRNGKey(0), n, sh_degree=sh,
                          position_scale=2.0))


def loss(p, cam):
    img = render_gaussians(
        p["means3d"], p["scales"], p["quats"], p["opacities"],
        p["features"], cam, sh_degree=sh,
        background_color=jnp.array([0.1, 0.1, 0.1]), config=config)
    return jnp.mean(img ** 2)


def step(p, cam):
    g = jax.grad(loss)(p, cam)
    return sum(jnp.sum(v) for v in g.values())


lowered = jax.jit(step).lower(params, camera)
compiled = lowered.compile()
ca = compiled.cost_analysis()
if isinstance(ca, list):
    ca = ca[0]
print(variant, "flops=%.3e" % ca.get("flops", -1),
      "bytes=%.3e" % ca.get("bytes accessed", -1))
ma = compiled.memory_analysis()
print(variant, "temp_bytes=%.3e" % ma.temp_size_in_bytes,
      "args=%.3e" % ma.argument_size_in_bytes,
      "out=%.3e" % ma.output_size_in_bytes)
with open(f"/tmp/hlo_{variant}.txt", "w") as f:
    f.write(compiled.as_text())
print("wrote /tmp/hlo_%s.txt" % variant)
