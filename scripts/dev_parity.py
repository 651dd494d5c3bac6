import jax, jax.numpy as jnp
from mojosplat_tpu import Camera, RenderConfig, render_gaussians
from mojosplat_tpu import train as mtrain

H, W = 64, 64
n = 200
cfg_x = RenderConfig(tile_capacity=256, chunk_size=64, max_tile_span=8)
cfg_p = RenderConfig(tile_capacity=256, chunk_size=64, max_tile_span=8,
                     raster_impl='pallas', pallas_chunk=128)
cam = Camera.create(R=jnp.eye(3), T=jnp.zeros(3), H=H, W=W, fx=60., fy=60., cx=W/2, cy=H/2)
p = mtrain.activate(mtrain.init_gaussians(jax.random.PRNGKey(0), n, position_scale=1.0))
bg = jnp.array([0.2, 0.1, 0.3])

def render(cfg, p):
    return render_gaussians(p['means3d'], p['scales'], p['quats'], p['opacities'],
                            p['features'], cam, background_color=bg, config=cfg)

ix = jax.jit(lambda p: render(cfg_x, p))(p)
ip = jax.jit(lambda p: render(cfg_p, p))(p)
print('fwd max diff:', float(jnp.max(jnp.abs(ix - ip))))

def loss(p, cfg):
    return jnp.mean(render(cfg, p)**2)
gx = jax.jit(lambda p: jax.grad(loss)(p, cfg_x))(p)
gp = jax.jit(lambda p: jax.grad(loss)(p, cfg_p))(p)
for k in gx:
    d = float(jnp.max(jnp.abs(gx[k] - gp[k])))
    m = float(jnp.max(jnp.abs(gx[k])))
    print(f'grad {k}: maxdiff={d:.3e} ref_max={m:.3e}')
