"""Micro-bench: lax.sort payload marginal cost + standalone row gather.

Decides between 'carry fields through the tile sort' vs 'gather after the
sort' for the binning->raster boundary at headline scale (4.19M slots).
See dev_bench.py header for this machine's TPU measurement rules.
"""

import functools
import time

import jax
import jax.numpy as jnp

M = 4_194_304  # headline isect capacity
N = 1_048_576  # gaussian count
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
    print(f"{name:40s} {(tN - t1) / (ITERS - 1) * 1000:8.2f} ms", flush=True)


key = jax.random.PRNGKey(0)
tile = jax.random.randint(key, (M,), 0, 8160, dtype=jnp.int32)
pay = [jax.random.randint(jax.random.PRNGKey(i + 1), (M,), 0, 1 << 30,
                          dtype=jnp.int32) for i in range(9)]
gids = jax.random.randint(jax.random.PRNGKey(99), (M,), 0, N,
                          dtype=jnp.int32)
packed = jax.random.normal(jax.random.PRNGKey(7), (10, N), jnp.float32)


def sort_p(p):
    def f(tile, *cols):
        out = jax.lax.sort((tile,) + cols, num_keys=1, is_stable=True)
        return sum(o[0].astype(jnp.float32) for o in out)
    return f


def gather_rows(packed_t, safe):
    pb, sb = jax.lax.optimization_barrier((packed_t, safe))
    rows = jax.lax.optimization_barrier(pb.T[sb])
    return jnp.sum(rows[:, 0])


import sys

which = sys.argv[1] if len(sys.argv) > 1 else "gather"
if which == "gather":
    amortized("row gather (4.2M, 10)", gather_rows, packed, gids)
else:
    p = int(which)
    amortized(f"sort M=4.2M key+{p} payloads", sort_p(p), tile, *pay[:p])
