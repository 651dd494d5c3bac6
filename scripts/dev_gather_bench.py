"""Gather-cost probes at headline scale: does row width/alignment or index
sortedness change the per-row cost of the XLA TPU row gather?

The packed-row gather is ~26 ms at 4.2M rows (6.2 ns/row, scalar-core
bound). If 16-row (64 B aligned) tables gather faster, pdata grows pad rows.
"""

import functools
import time

import jax
import jax.numpy as jnp

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
gids = jax.random.randint(key, (M,), 0, N, dtype=jnp.int32)
gids_sorted = jnp.sort(gids)
tab16 = jax.random.normal(jax.random.PRNGKey(7), (16, N), jnp.float32)


def gather_w(w, sorted_ix=False):
    def f(tab, ix):
        tb, ib = jax.lax.optimization_barrier((tab[:w], ix))
        rows = jax.lax.optimization_barrier(
            jnp.take(tb.T, ib, axis=0, indices_are_sorted=sorted_ix)
        )
        return jnp.sum(rows[:, 0])
    return f


amortized("gather (4.2M, 10)", gather_w(10), tab16, gids)
amortized("gather (4.2M, 16) aligned", gather_w(16), tab16, gids)
amortized("gather (4.2M, 8) aligned", gather_w(8), tab16, gids)
amortized("gather (4.2M, 4)", gather_w(4), tab16, gids)
amortized("gather (4.2M, 16) sorted ix", gather_w(16, True), tab16,
          gids_sorted)
