"""Real-TPU parity: surfel (2DGS) Pallas aux kernels vs the XLA oracle.

Mirrors tests/test_surfel.py::test_surfel_pallas_maps_gradient_parity but on
the actual device (pallas_interpret=False) and at a bigger scene, so Mosaic
lowering of the aux kernel variant is validated, not just interpreter
semantics. Run from /root/repo with runpy (CLAUDE.md machine rules).
"""

import jax
import jax.numpy as jnp
import numpy as np

from mojosplat_tpu import Camera, RenderConfig
from mojosplat_tpu.surfel import render_surfels


def make_camera(H=256, W=256, fx=300.0):
    return Camera.create(
        R=np.eye(3, dtype=np.float32), T=np.zeros(3, np.float32),
        H=H, W=W, fx=fx, fy=fx, cx=W / 2, cy=H / 2,
    )


def random_scene(n, seed=7):
    rng = np.random.default_rng(seed)
    return dict(
        means3d=jnp.asarray(np.concatenate(
            [rng.normal(0, 0.5, (n, 2)), rng.uniform(1.5, 5.0, (n, 1))],
            axis=1).astype(np.float32)),
        scales=jnp.asarray(rng.normal(-2.2, 0.3, (n, 2)).astype(np.float32)),
        quats=jnp.asarray(rng.normal(0, 1, (n, 4)).astype(np.float32)),
        opacities=jnp.asarray(rng.uniform(0.3, 0.9, n).astype(np.float32)),
        features=jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32)),
    )


def main():
    cam = make_camera()
    p = random_scene(n=5000)
    bg = jnp.array([0.1, 0.1, 0.1])

    def outputs_for(impl):
        cfg = RenderConfig(raster_impl=impl)

        @jax.jit
        def fwd(q):
            return render_surfels(
                q["means3d"], q["scales"], q["quats"], q["opacities"],
                q["features"], cam, config=cfg, background_color=bg,
                return_depth=True, return_normals=True,
                return_distortion=True,
            )

        def loss(q):
            img, depth, normals, dist = fwd.__wrapped__(q)
            return (jnp.mean(img**2) + 0.3 * jnp.mean(depth**2)
                    + 0.2 * jnp.mean(normals * normals)
                    + 0.5 * jnp.mean(dist))

        return fwd(p), jax.jit(jax.grad(loss))(p)

    (ox, gx), (op_, gp) = outputs_for("xla"), outputs_for("pallas")
    names = ["img", "depth", "normals", "dist"]
    for name, a, b in zip(names, ox, op_):
        d = float(jnp.max(jnp.abs(a - b)))
        print(f"fwd {name}: maxdiff={d:.3e} ref_max={float(jnp.max(jnp.abs(a))):.3e}")
    for k in sorted(gx):
        d = float(jnp.max(jnp.abs(gx[k] - gp[k])))
        m = float(jnp.max(jnp.abs(gx[k])))
        print(f"grad {k}: maxdiff={d:.3e} ref_max={m:.3e}")


if __name__ == "__main__":
    main()
