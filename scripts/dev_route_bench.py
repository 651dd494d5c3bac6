"""Decompose the gradient-routing cost at headline scale, in one process.

Measures: the route sort (stable vs unstable), segment_sum_cols alone, the
full _route_slot_grads, and the raster fwd at the production (tps=8, K=256)
config. See dev_bench.py header for measurement rules.
"""

import functools
import time

import jax
import jax.numpy as jnp

from mojosplat_tpu.ops.segsum_pallas import segment_sum_cols

M = 4_194_304
N = 1_048_576
ITERS = 8


def amortized(name, fn, *args):
    def loop(args, iters):
        def body(c, _):
            perturbed = jax.tree_util.tree_map(
                lambda x: x + (c * 0).astype(x.dtype), args)
            return fn(*perturbed).astype(jnp.float32), None

        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return out

    f = jax.jit(functools.partial(loop, iters=ITERS))
    f1 = jax.jit(functools.partial(loop, iters=1))
    float(f1(args)); float(f(args))
    t0 = time.perf_counter(); float(f1(args)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(f(args)); tN = time.perf_counter() - t0
    print(f"{name:44s} {(tN - t1) / (ITERS - 1) * 1000:8.2f} ms", flush=True)


key = jax.random.PRNGKey(0)
gids = jnp.sort(jax.random.randint(key, (M,), 0, N, dtype=jnp.int32))
gids_unsorted = jax.random.randint(key, (M,), 0, N, dtype=jnp.int32)
pay = [jax.random.randint(jax.random.PRNGKey(i + 1), (M,), 0, 1 << 30,
                          dtype=jnp.int32) for i in range(5)]
cols = tuple(jax.random.normal(jax.random.PRNGKey(i + 20), (M,))
             for i in range(9))


def sort_route(stable):
    def f(k, *cs):
        out = jax.lax.sort((k,) + cs, num_keys=1, is_stable=stable)
        return sum(o[0].astype(jnp.float32) for o in out)
    return f


def seg(ks, *cs):
    out = segment_sum_cols(cs, ks, N, exact=False)
    return jnp.sum(out)


amortized("route sort stable key+5", sort_route(True), gids_unsorted, *pay)
amortized("route sort unstable key+5", sort_route(False), gids_unsorted,
          *pay)
amortized("segsum 9 cols (sorted keys)", seg, gids, *cols)
