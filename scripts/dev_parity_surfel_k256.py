import jax, jax.numpy as jnp
from mojosplat_tpu import Camera, RenderConfig
from mojosplat_tpu.surfel import render_surfels
from mojosplat_tpu import train as mtrain

H, W = 128, 128
n = 500
kw = dict(tile_capacity=512, chunk_size=64, max_tile_span=8)
cfg_x = RenderConfig(**kw)
cfg_p = RenderConfig(**kw, raster_impl='pallas', pallas_chunk=256,
                     pallas_tiles_per_step=8)
cfg_pb = RenderConfig(**kw, raster_impl='pallas', pallas_chunk=256,
                      pallas_tiles_per_step=8, grad_route_bf16=True)
cam = Camera.create(R=jnp.eye(3), T=jnp.zeros(3), H=H, W=W, fx=120., fy=120., cx=W/2, cy=H/2)
p = mtrain.activate(mtrain.init_gaussians(jax.random.PRNGKey(0), n, position_scale=1.0))
p['scales'] = p['scales'][:, :2]
bg = jnp.array([0.2, 0.1, 0.3])

def render(cfg, p):
    img, depth, normal, dist = render_surfels(
        p['means3d'], p['scales'], p['quats'], p['opacities'], p['features'],
        cam, background_color=bg, config=cfg, return_depth=True,
        return_normals=True, return_distortion=True)
    return img, depth, normal, dist

ix = jax.jit(lambda p: render(cfg_x, p))(p)
ip = jax.jit(lambda p: render(cfg_p, p))(p)
for name, a, b in zip(('img','depth','normal','dist'), ix, ip):
    print(f'surfel fwd {name} maxdiff:', float(jnp.max(jnp.abs(a - b))), flush=True)

def loss(p, cfg):
    img, depth, normal, dist = render(cfg, p)
    return (jnp.mean(img**2) + 1e-3*jnp.mean(depth**2)
            + 1e-3*jnp.mean(normal**2) + 1e-3*jnp.mean(dist))
gx = jax.jit(lambda p: jax.grad(loss)(p, cfg_x))(p)
gp = jax.jit(lambda p: jax.grad(loss)(p, cfg_p))(p)
gb = jax.jit(lambda p: jax.grad(loss)(p, cfg_pb))(p)
for k in gx:
    d = float(jnp.max(jnp.abs(gx[k] - gp[k])))
    db = float(jnp.max(jnp.abs(gx[k] - gb[k])))
    m = float(jnp.max(jnp.abs(gx[k])))
    print(f'surfel grad {k}: exact={d:.3e} bf16={db:.3e} ref_max={m:.3e}', flush=True)
