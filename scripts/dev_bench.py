"""Dev micro-benchmark for the renderer (single-chip, any impl).

Measurement rules discovered for this machine's TPU tunnel (axon):
  - Per synchronized dispatch there is a ~30 ms round-trip overhead, so all
    timing loops run *inside* one jit via lax.scan, chained through a carry
    so XLA cannot CSE the iterations; the overhead is amortized.
  - Never closure-capture pre-existing device arrays in a jitted function
    (the process permanently falls off the fast dispatch path); pass the
    camera and parameters as arguments.
  - Never run two TPU processes concurrently.
"""

import argparse
import time

import jax
import jax.numpy as jnp

from mojosplat_tpu import Camera, RenderConfig, render_gaussians
from mojosplat_tpu import train as mtrain


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default="pallas")
    ap.add_argument("--gaussians", type=int, default=100_000)
    ap.add_argument("--height", type=int, default=600)
    ap.add_argument("--width", type=int, default=800)
    ap.add_argument("--sh", type=int, default=3)
    ap.add_argument("--mode", default="fwdbwd")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--tile-capacity", type=int, default=512)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--span", type=int, default=8)
    a = ap.parse_args()

    cfg = RenderConfig(
        tile_capacity=a.tile_capacity, chunk_size=64, tile_batch=512,
        max_tile_span=a.span, raster_impl=a.impl, pallas_chunk=a.chunk,
    )
    H, W, n = a.height, a.width, a.gaussians
    camera = Camera.create(R=jnp.eye(3), T=jnp.zeros(3), H=H, W=W,
                           fx=0.5 * W, fy=0.5 * W, cx=W / 2, cy=H / 2)
    sh = a.sh if a.sh >= 0 else None
    params = mtrain.activate(
        mtrain.init_gaussians(jax.random.PRNGKey(0), n, sh_degree=sh,
                              position_scale=2.0)
    )

    def forward(p, cam):
        return render_gaussians(
            p["means3d"], p["scales"], p["quats"], p["opacities"],
            p["features"], cam, sh_degree=sh,
            background_color=jnp.array([0.1, 0.1, 0.1]), config=cfg,
        )

    def one_step(p, cam):
        if a.mode == "fwd":
            return jnp.sum(forward(p, cam))
        g = jax.grad(lambda q: jnp.mean(forward(q, cam) ** 2))(p)
        return sum(jnp.sum(v) for v in g.values())

    def loop(p, cam, iters):
        def body(carry, _):
            # Chain iterations through the carry so XLA cannot collapse them.
            q = dict(p)
            q["means3d"] = p["means3d"] + carry * 0.0
            return one_step(q, cam), None

        out, _ = jax.lax.scan(body, 0.0, None, length=iters)
        return out

    import functools
    fn = jax.jit(functools.partial(loop, iters=a.iters))
    fn1 = jax.jit(functools.partial(loop, iters=1))

    float(fn1(params, camera))  # compile 1-iter
    float(fn(params, camera))  # compile N-iter
    t1 = time.perf_counter()
    float(fn1(params, camera))
    t1 = time.perf_counter() - t1
    t0 = time.perf_counter()
    float(fn(params, camera))
    total = time.perf_counter() - t0
    dt = (total - t1) / (a.iters - 1)  # overhead-cancelled per-iter time
    print(
        f"impl={a.impl} mode={a.mode} n={n} {W}x{H} sh={a.sh}: "
        f"{dt*1000:.2f} ms/iter = {H*W/dt/1e6:.2f} Mpixels/s "
        f"(1-iter call {t1*1000:.1f} ms, {a.iters}-iter call {total*1000:.1f} ms)"
    )


if __name__ == "__main__":
    main()
