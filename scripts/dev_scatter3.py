"""Primitives for the pre-sort-order gradient routing design at 1080p scale."""
import time, functools
import jax, jax.numpy as jnp

N, M, F = 1_000_000, 4_177_920, 10
rows = jnp.ones((M, F))
perm = jax.random.permutation(jax.random.PRNGKey(0), M)
idx_sorted_seg = jnp.sort(jax.random.randint(jax.random.PRNGKey(1), (M,), 0, N))

def amort(name, f, *args, iters=5):
    def loop(args, iters):
        def body(c, _):
            a0 = args[0] + c * 0.0
            return jnp.sum(f(a0, *args[1:])).astype(jnp.float32), None
        out, _ = jax.lax.scan(body, 0.0, None, length=iters)
        return out
    fn = jax.jit(functools.partial(loop, iters=iters)); fn1 = jax.jit(functools.partial(loop, iters=1))
    float(fn1(args)); float(fn(args))
    t0=time.perf_counter(); float(fn1(args)); t1=time.perf_counter()-t0
    t0=time.perf_counter(); float(fn(args)); tN=time.perf_counter()-t0
    print(f'{name:44s} {(tN-t1)/(iters-1)*1000:8.2f} ms')

amort('perm row gather (M,10)', lambda r, p: r[p], rows, perm)
amort('perm scatter set unique (M,10)', lambda r, p: jnp.zeros((M, F)).at[p].set(r, unique_indices=True, mode='drop'), rows, perm)
amort('perm scatter set int32 (M,)', lambda r, p: jnp.zeros((M,), jnp.int32).at[p].set(r[:,0].astype(jnp.int32), unique_indices=True, mode='drop'), rows, perm)
amort('cumsum (M,10) axis0', lambda r: jnp.cumsum(r, axis=0), rows)
def boundary_reduce(r, b):
    cs = jnp.cumsum(r, axis=0)
    csp = jnp.concatenate([jnp.zeros((1, F)), cs], axis=0)
    return csp[b[1:]] - csp[b[:-1]]
bounds = jnp.searchsorted(idx_sorted_seg, jnp.arange(N + 1, dtype=jnp.int32)).astype(jnp.int32)
amort('cumsum + boundary gather to (N,10)', boundary_reduce, rows, bounds)
