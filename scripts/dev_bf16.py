import time, functools
import jax, jax.numpy as jnp
from mojosplat_tpu import Camera, RenderConfig, render_gaussians
from mojosplat_tpu import train as mtrain

H, W, n, sh = 1080, 1920, 1_000_000, 3
camera = Camera.create(R=jnp.eye(3), T=jnp.zeros(3), H=H, W=W, fx=0.5*W, fy=0.5*W, cx=W/2, cy=H/2)
params = mtrain.activate(mtrain.init_gaussians(jax.random.PRNGKey(0), n, sh_degree=sh, position_scale=2.0))

def grad_fn(cfg):
    def g(p, cam):
        return jax.grad(lambda q: jnp.mean(render_gaussians(
            q['means3d'], q['scales'], q['quats'], q['opacities'], q['features'],
            cam, sh_degree=sh, background_color=jnp.array([0.1,0.1,0.1]), config=cfg)**2))(p)
    return g

cfgs = {}
for name, bf in [('f32', False), ('bf16', True)]:
    cfgs[name] = RenderConfig(tile_capacity=512, chunk_size=64, tile_batch=512, max_tile_span=8,
                              raster_impl='pallas', pallas_chunk=128, grad_route_bf16=bf)

g32 = jax.jit(grad_fn(cfgs['f32']))(params, camera)
g16 = jax.jit(grad_fn(cfgs['bf16']))(params, camera)
for k in g32:
    d = float(jnp.max(jnp.abs(g32[k] - g16[k]))); m = float(jnp.max(jnp.abs(g32[k])))
    print(f'{k}: maxdiff={d:.3e} rel={d/(m+1e-30):.4f}')

def bench(cfg):
    gf = grad_fn(cfg)
    def loop(p, cam, iters):
        def body(c, _):
            q = dict(p); q['means3d'] = p['means3d'] + c*0.0
            return sum(jnp.sum(v) for v in gf(q, cam).values()), None
        return jax.lax.scan(body, 0.0, None, length=iters)[0]
    fn = jax.jit(functools.partial(loop, iters=10)); fn1 = jax.jit(functools.partial(loop, iters=1))
    float(fn1(params, camera)); float(fn(params, camera))
    t0=time.perf_counter(); float(fn1(params, camera)); t1=time.perf_counter()-t0
    t0=time.perf_counter(); float(fn(params, camera)); tN=time.perf_counter()-t0
    return (tN-t1)/9*1000
for name in ['f32', 'bf16']:
    print(name, f'{bench(cfgs[name]):.1f} ms/step')
