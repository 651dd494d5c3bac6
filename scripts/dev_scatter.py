"""Find the fastest scatter-add form for the gather backward."""
import time, functools
import jax, jax.numpy as jnp

N, M, F = 100_000, 384_000, 10
rows = jnp.ones((M, F))
idx = jax.random.randint(jax.random.PRNGKey(0), (M,), 0, N)

def amort(name, f, *args, iters=20):
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
    print(f'{name:40s} {(tN-t1)/(iters-1)*1000:8.2f} ms')

amort('at[idx].add rows (M,10)', lambda r, i: jnp.zeros((N, F)).at[i].add(r), rows, idx)
amort('segment_sum rows', lambda r, i: jax.ops.segment_sum(r, i, num_segments=N), rows, idx)
amort('at[idx].add rows (M,16)', lambda r, i: jnp.zeros((N, 16)).at[i].add(jnp.pad(r, ((0,0),(0,6)))), rows, idx)
# sorted-index variant: how much does sortedness help?
idx_sorted = jnp.sort(idx)
amort('at[sorted].add', lambda r, i: jnp.zeros((N, F)).at[i].add(r), rows, idx_sorted)
amort('segment_sum sorted (hint)', lambda r, i: jax.ops.segment_sum(r, i, num_segments=N, indices_are_sorted=True), rows, idx_sorted)
