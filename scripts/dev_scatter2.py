"""Scatter-add alternatives at 1080p scale: M=4.18M updates, N=1M dests."""
import time, functools
import jax, jax.numpy as jnp

N, M, F = 1_000_000, 4_177_920, 10
rows = jnp.ones((M, F))
idx = jax.random.randint(jax.random.PRNGKey(0), (M,), 0, N)

def amort(name, f, *args, iters=5):
    def loop(args, iters):
        def body(c, _):
            a0 = args[0] + c * 0.0
            return jnp.sum(f(a0, *args[1:])), None
        out, _ = jax.lax.scan(body, 0.0, None, length=iters)
        return out
    fn = jax.jit(functools.partial(loop, iters=iters)); fn1 = jax.jit(functools.partial(loop, iters=1))
    float(fn1(args)); float(fn(args))
    t0=time.perf_counter(); float(fn1(args)); t1=time.perf_counter()-t0
    t0=time.perf_counter(); float(fn(args)); tN=time.perf_counter()-t0
    print(f'{name:44s} {(tN-t1)/(iters-1)*1000:8.2f} ms')

amort('scatter-add (M,10)->(N,10)', lambda r, i: jnp.zeros((N, F)).at[i].add(r), rows, idx)
amort('segment_sum unsorted', lambda r, i: jax.ops.segment_sum(r, i, num_segments=N), rows, idx)

def sort_segsum(r, i):
    # sort rows by gaussian id, then boundary-gather cumsum
    ops = jax.lax.sort((i,) + tuple(r[:, k] for k in range(F)), num_keys=1)
    si = ops[0]
    sr = jnp.stack(ops[1:], axis=-1)
    cs = jnp.cumsum(sr, axis=0)
    b = jnp.searchsorted(si, jnp.arange(N + 1, dtype=jnp.int32))
    csp = jnp.concatenate([jnp.zeros((1, F)), cs], axis=0)
    return csp[b[1:]] - csp[b[:-1]]
amort('sort + cumsum + boundary gather', sort_segsum, rows, idx)

def sorted_segsum(r, i):
    return jax.ops.segment_sum(r, i, num_segments=N, indices_are_sorted=True)
idx_s = jnp.sort(idx)
amort('segment_sum pre-sorted ids', sorted_segsum, rows, idx_s)
amort('scatter-add pre-sorted ids', lambda r, i: jnp.zeros((N, F)).at[i].add(r, indices_are_sorted=True), rows, idx_s)
