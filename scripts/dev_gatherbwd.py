import time, functools
import jax, jax.numpy as jnp

N, F = 100_000, 10
n_tiles, cap = 750, 512
packed = jnp.ones((N, F))
table = jax.random.randint(jax.random.PRNGKey(0), (n_tiles, cap), -1, N)

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
    print(f'{name:44s} {(tN-t1)/(iters-1)*1000:8.2f} ms')

def g(fn):
    return lambda p, t: jax.grad(lambda q: jnp.sum(fn(q, t)**2))(p)

def gather_only(p, t):
    safe = jnp.clip(t.reshape(-1), 0, N-1)
    return p[safe].reshape(n_tiles, cap, F)
def gather_where(p, t):
    r = gather_only(p, t)
    return jnp.where((t >= 0)[..., None], r, 0.0)
def gather_where_tr(p, t):
    return gather_where(p, t).transpose(0, 2, 1)

amort('bwd: gather only', g(gather_only), packed, table)
amort('bwd: gather + where', g(gather_where), packed, table)
amort('bwd: gather + where + transpose', g(gather_where_tr), packed, table)
amort('fwd: gather + where + transpose', gather_where_tr, packed, table)
