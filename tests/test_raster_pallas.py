"""Pallas kernel parity tests (interpreter mode, CPU).

The Pallas TPU kernels (ops/raster_pallas.py, ops/segsum_pallas.py) are the
production rasterization path; the pure-XLA implementation is the oracle
(the role gsplat plays for the reference, SURVEY.md section 4). These tests
run the kernels through the Pallas interpreter so they execute anywhere,
mirroring the reference's mojo-vs-gsplat parity tests
(/root/reference/tests/test_rasterization.py:91-146).
"""

import jax
import jax.numpy as jnp
import pytest

from mojosplat_tpu import Camera, RenderConfig, render_gaussians
from mojosplat_tpu import train as mtrain
from mojosplat_tpu.ops.segsum_pallas import segment_sum_rows

CFG_KW = dict(tile_capacity=128, chunk_size=64, max_tile_span=4)
CFG_XLA = RenderConfig(**CFG_KW)
CFG_PALLAS = RenderConfig(
    **CFG_KW, raster_impl="pallas", pallas_chunk=128, pallas_interpret=True
)


def make_scene(n=120, seed=0):
    params = mtrain.activate(
        mtrain.init_gaussians(jax.random.PRNGKey(seed), n, position_scale=1.0)
    )
    camera = Camera.create(
        R=jnp.eye(3), T=jnp.zeros(3), H=32, W=48,
        fx=40.0, fy=40.0, cx=24.0, cy=16.0,
    )
    return params, camera


def render(config, params, camera, bg=(0.2, 0.1, 0.3)):
    return render_gaussians(
        params["means3d"], params["scales"], params["quats"],
        params["opacities"], params["features"], camera,
        background_color=jnp.array(bg), config=config,
    )


class TestPallasVsXla:
    """Cross-implementation parity: XLA path is the oracle."""

    def test_forward_image_close(self):
        params, camera = make_scene()
        ix = render(CFG_XLA, params, camera)
        ip = render(CFG_PALLAS, params, camera)
        assert ix.shape == ip.shape == (32, 48, 3)
        assert jnp.max(jnp.abs(ix - ip)) < 1e-5

    def test_gradients_close(self):
        params, camera = make_scene()

        def loss(p, config):
            return jnp.mean(render(config, p, camera) ** 2)

        gx = jax.grad(lambda p: loss(p, CFG_XLA))(params)
        gp = jax.grad(lambda p: loss(p, CFG_PALLAS))(params)
        for k in gx:
            ref = jnp.max(jnp.abs(gx[k])) + 1e-12
            diff = jnp.max(jnp.abs(gx[k] - gp[k]))
            assert diff / ref < 1e-4, f"grad {k}: {diff} vs scale {ref}"

    def test_empty_scene_is_background(self):
        params, camera = make_scene(n=4)
        params = dict(params)
        params["means3d"] = jnp.full_like(params["means3d"], -100.0)
        img = render(CFG_PALLAS, params, camera)
        assert jnp.allclose(img[..., 0], 0.2, atol=1e-6)
        assert jnp.allclose(img[..., 1], 0.1, atol=1e-6)
        assert jnp.allclose(img[..., 2], 0.3, atol=1e-6)

    def test_bf16_grad_route_close(self):
        # grad_route_bf16 sorts pair-packed bf16 per-slot gradients; in
        # interpret/CPU mode the converts execute literally, so expect
        # ~bf16-level relative error vs the exact f32 route, not equality.
        params, camera = make_scene(n=90, seed=5)
        cfg_fast = RenderConfig(
            **CFG_KW, raster_impl="pallas", pallas_chunk=128,
            pallas_interpret=True, grad_route_bf16=True,
        )

        def loss(p, config):
            return jnp.mean(render(config, p, camera) ** 2)

        gx = jax.grad(lambda p: loss(p, CFG_PALLAS))(params)
        gf = jax.grad(lambda p: loss(p, cfg_fast))(params)
        for k in gx:
            ref = jnp.max(jnp.abs(gx[k])) + 1e-12
            diff = jnp.max(jnp.abs(gx[k] - gf[k]))
            assert diff / ref < 3e-2, f"grad {k}: {diff} vs scale {ref}"

    def test_early_termination_matches(self):
        # Opaque front gaussian saturates transmittance: the chunk-level
        # early exit must reproduce the sequential break exactly.
        params, camera = make_scene(n=60, seed=3)
        params = dict(params)
        params["opacities"] = jnp.full_like(params["opacities"], 0.999)
        ix = render(CFG_XLA, params, camera)
        ip = render(CFG_PALLAS, params, camera)
        assert jnp.max(jnp.abs(ix - ip)) < 1e-5


class TestConfigValidation:
    def test_bad_impl_raises(self):
        params, camera = make_scene(n=4)
        with pytest.raises(ValueError, match="raster_impl"):
            render(RenderConfig(raster_impl="cuda"), params, camera)

    def test_capacity_chunk_mismatch_raises(self):
        params, camera = make_scene(n=4)
        cfg = RenderConfig(
            tile_capacity=192, chunk_size=64,
            raster_impl="pallas", pallas_chunk=128, pallas_interpret=True,
        )
        with pytest.raises(ValueError, match="pallas_chunk"):
            render(cfg, params, camera)


class TestSegmentSum:
    def test_matches_xla_segment_sum(self):
        M, N, F = 3000, 500, 10
        key = jax.random.randint(jax.random.PRNGKey(0), (M,), 0, N)
        rows = jax.random.normal(jax.random.PRNGKey(1), (M, F))
        ref = jax.ops.segment_sum(rows, key, num_segments=N)
        out = segment_sum_rows(rows, key, N, interpret=True)
        assert jnp.max(jnp.abs(out - ref)) < 1e-5

    def test_padding_keys_dropped(self):
        M, N, F = 257, 64, 3
        key = jnp.concatenate(
            [jnp.zeros((M - 7,), jnp.int32), jnp.full((7,), N, jnp.int32)]
        )
        rows = jnp.ones((M, F))
        out = segment_sum_rows(rows, key, N, interpret=True)
        assert out[0, 0] == M - 7  # only in-range keys counted
        assert jnp.all(out[1:] == 0)

    def test_empty_segments(self):
        M, N, F = 100, 300, 2
        key = jnp.full((M,), 123, jnp.int32)
        rows = jnp.ones((M, F)) * 0.5
        out = segment_sum_rows(rows, key, N, interpret=True)
        assert jnp.allclose(out[123], 50.0)
        assert float(jnp.sum(jnp.abs(out))) == pytest.approx(100.0 * 0.5 * F)


def test_nd_feature_channels_parity():
    # gsplat-style N-D channel rendering: the kernels blend arbitrary
    # per-gaussian channel vectors (feature splatting), not just rgb+aux.
    import jax.numpy as jnp
    import numpy as np

    params, camera = make_scene(n=100, seed=3)
    C = 9
    feats = jax.random.normal(jax.random.PRNGKey(8), (100, C)) * 0.3
    bg = jnp.linspace(0.0, 1.0, C)

    def render_feats(config, f):
        return render_gaussians(
            params["means3d"], params["scales"], params["quats"],
            params["opacities"], f, camera, background_color=bg,
            config=config,
        )

    img_x = render_feats(CFG_XLA, feats)
    img_p = render_feats(CFG_PALLAS, feats)
    assert img_p.shape == (32, 48, C)
    np.testing.assert_allclose(
        np.asarray(img_p), np.asarray(img_x), atol=3e-5
    )

    gx = jax.grad(lambda f: jnp.mean(render_feats(CFG_XLA, f) ** 2))(feats)
    gp = jax.grad(lambda f: jnp.mean(render_feats(CFG_PALLAS, f) ** 2))(
        feats
    )
    np.testing.assert_allclose(
        np.asarray(gp), np.asarray(gx), rtol=1e-4, atol=1e-7
    )
