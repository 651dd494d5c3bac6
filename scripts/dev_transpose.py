"""Isolate the cost of the packed row gather vs its field-major transpose.

gather_tile_data = pack (N,10) -> gather (M,10) -> transpose to (10,M).
Hypothesis: the row gather itself runs at ~2.7 ns/row but the (M,10)->(10,M)
XLA transpose (strided 167 MB relayout) costs as much again.
"""

import functools
import time

import jax
import jax.numpy as jnp

N = 1_000_000
M = 4_186_112  # n_tiles(8176 padded) * 512 at 1080p
ITERS = 10


def amortized(name, fn, *args):
    def loop(a, iters):
        def body(c, _):
            a2 = [x + c * 0.0 if jnp.issubdtype(x.dtype, jnp.floating)
                  else x for x in a]
            return jnp.sum(fn(*a2).astype(jnp.float32)[:3, :3]) * 0.0, None

        out, _ = jax.lax.scan(body, 0.0, None, length=iters)
        return out

    f = jax.jit(functools.partial(loop, iters=ITERS))
    f1 = jax.jit(functools.partial(loop, iters=1))
    float(f1(args)); float(f(args))
    t0 = time.perf_counter(); float(f1(args)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(f(args)); tN = time.perf_counter() - t0
    dt = (tN - t1) / (ITERS - 1)
    print(f"{name:34s} {dt*1000:8.2f} ms  ({dt/M*1e9:.2f} ns/row)",
          flush=True)


key = jax.random.PRNGKey(0)
packed = jax.random.normal(key, (N, 10), jnp.float32)
safe = jax.random.randint(jax.random.PRNGKey(1), (M,), 0, N, jnp.int32)


def barriered_gather(p, s):
    pb, sb = jax.lax.optimization_barrier((p, s))
    return jax.lax.optimization_barrier(pb[sb])


amortized("gather rows (M,10)", barriered_gather, packed, safe)
amortized("gather rows + .T (10,M)",
          lambda p, s: barriered_gather(p, s).T, packed, safe)
amortized("transpose only (M,10)->(10,M)",
          lambda r: jax.lax.optimization_barrier(r).T,
          barriered_gather(packed, safe))
