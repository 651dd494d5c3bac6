"""lax.sort cost at 4.18M rows vs payload operand count (TPU).

Decides between gather-after-sort (per-row scalar cost) and carrying data
columns through the binning sort (per-byte streaming cost).
"""

import functools
import time

import jax
import jax.numpy as jnp

M = 4_186_112
ITERS = 10


def amortized(name, fn, *args):
    def loop(a, iters):
        def body(c, _):
            a2 = [x + c * 0.0 if jnp.issubdtype(x.dtype, jnp.floating)
                  else x for x in a]
            out = fn(*a2)
            acc = sum(jnp.sum(o[:3].astype(jnp.float32)) for o in out)
            return acc * 0.0, None

        out, _ = jax.lax.scan(body, 0.0, None, length=iters)
        return out

    f = jax.jit(functools.partial(loop, iters=ITERS))
    f1 = jax.jit(functools.partial(loop, iters=1))
    float(f1(args)); float(f(args))
    t0 = time.perf_counter(); float(f1(args)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(f(args)); tN = time.perf_counter() - t0
    dt = (tN - t1) / (ITERS - 1)
    print(f"{name:44s} {dt*1000:8.2f} ms", flush=True)


key = jax.random.PRNGKey(0)
tiles = jax.random.randint(key, (M,), 0, 8160, jnp.int32)
depth = jax.random.uniform(jax.random.PRNGKey(1), (M,), jnp.float32)
payloads = [
    jax.random.normal(jax.random.PRNGKey(2 + i), (M,), jnp.float32)
    for i in range(13)
]
bf = [p.astype(jnp.bfloat16) for p in payloads]

import sys
GROUP = sys.argv[1] if len(sys.argv) > 1 else "a"
if GROUP == "a":
    amortized("sort 2 keys (tile,depth) + 1 payload",
              lambda *a: jax.lax.sort(a, num_keys=2),
              tiles, depth, payloads[0])
elif GROUP == "a2":
    amortized("sort 2 keys (tile,depth) + 11 f32",
              lambda *a: jax.lax.sort(a, num_keys=2),
              tiles, depth, *payloads[:11])
elif GROUP == "b":
    amortized("sort 1 key + 1 f32",
              lambda *a: jax.lax.sort(a, num_keys=1),
              tiles, payloads[0])
elif GROUP == "c":
    amortized("sort 1 key + 9 bf16 payloads",
              lambda *a: jax.lax.sort(a, num_keys=1),
              tiles, *bf[:9])
elif GROUP == "d":
    n1 = 1_000_000
    amortized("presort 1M (depth key + 1 payload)",
              lambda *a: jax.lax.sort(a, num_keys=1),
              depth[:n1], payloads[0][:n1])
