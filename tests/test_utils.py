"""Utility subsystem tests: image IO, metrics, checkpointing."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from mojosplat_tpu import train as mtrain
from mojosplat_tpu.utils import StageTimer, compilation_count, to_uint8
from mojosplat_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint
from mojosplat_tpu.utils.metrics import log_render_aux


def test_to_uint8_clips():
    img = np.array([[[-0.5, 0.5, 1.5]]])
    out = to_uint8(img)
    assert out.dtype == np.uint8
    assert list(out[0, 0]) == [0, 127, 255]


def test_stage_timer():
    t = StageTimer()
    x = jnp.ones((8, 8))
    for _ in range(3):
        t.time_fn("double", lambda a: a * 2, x)
    s = t.summary()
    assert s["double"]["count"] == 3
    assert s["double"]["mean_ms"] >= 0


def test_compilation_count():
    # Fresh cache: in a long full-suite run the global jit cache can evict
    # entries between compilations (observed: cache_size 0 right after a
    # call), which is environment noise, not a recompile-counter bug.
    jax.clear_caches()
    f = jax.jit(lambda x: x + 1)
    f(jnp.ones(4))
    assert compilation_count(f) == 1
    f(jnp.ones(4) * 2)  # same shape: no recompile
    assert compilation_count(f) == 1
    f(jnp.ones(8))  # new shape: recompile
    assert compilation_count(f) == 2


def test_checkpoint_roundtrip(tmp_path):
    params = mtrain.init_gaussians(jax.random.PRNGKey(0), 16, sh_degree=1)
    path = os.path.join(tmp_path, "ckpt")
    save_checkpoint(path, params)
    restored = restore_checkpoint(path)
    for k in params:
        np.testing.assert_array_equal(
            np.asarray(params[k]), np.asarray(restored[k])
        )


def test_log_render_aux():
    from mojosplat_tpu.ops.binning import BinningAux
    from mojosplat_tpu.ops.rasterization import RasterAux
    from mojosplat_tpu.render import RenderAux

    aux = RenderAux(
        binning=BinningAux(
            num_isects=jnp.int32(10),
            capacity_overflow=jnp.int32(0),
            span_truncated=jnp.int32(2),
            tight_culled=jnp.int32(0),
        ),
        raster=RasterAux(
            final_transmittance=jnp.ones((4, 4)), tile_overflow=jnp.int32(0)
        ),
    )
    rec = log_render_aux(aux, step=3)
    assert rec["num_isects"] == 10
    assert rec["step"] == 3


class TestSSIM:
    def test_identical_images(self):
        import jax, jax.numpy as jnp
        from mojosplat_tpu.train import ssim, dssim_l1_loss

        img = jax.random.uniform(jax.random.PRNGKey(0), (32, 32, 3))
        assert float(ssim(img, img)) > 0.9999
        assert float(dssim_l1_loss(img, img)) < 1e-5

    def test_noise_lowers_ssim(self):
        import jax, jax.numpy as jnp
        from mojosplat_tpu.train import ssim

        img = jax.random.uniform(jax.random.PRNGKey(0), (32, 32, 3))
        noisy = jnp.clip(
            img + 0.3 * jax.random.normal(jax.random.PRNGKey(1), img.shape),
            0, 1,
        )
        assert float(ssim(img, noisy)) < 0.9

    def test_ssim_bounded_on_flat_regions(self):
        """SSIM must never exceed 1 (+fp noise). With default-precision TPU
        convs the bf16 variance cancellation error dwarfs c2 on constant
        regions and SSIM exploded to ~1.7 (negative training loss, NaN
        gradients) — the convs now pin HIGHEST precision. CPU convs can't
        reproduce the bf16 failure, but this pins the invariant."""
        import jax, jax.numpy as jnp
        from mojosplat_tpu.train import ssim

        flat = jnp.zeros((64, 64, 3))
        half = flat.at[:32].set(0.8)  # flat with one hard edge
        for a, b in ((flat, flat), (half, half), (half, flat)):
            val = float(ssim(a, b))
            assert val <= 1.0 + 1e-5, val

    def test_batched_and_differentiable(self):
        import jax, jax.numpy as jnp
        from mojosplat_tpu.train import dssim_l1_loss

        a = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3))
        b = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3))
        g = jax.grad(lambda x: dssim_l1_loss(x, b))(a)
        assert g.shape == a.shape
        assert bool(jnp.all(jnp.isfinite(g)))


# ---------------------------------------------------------------------------
# selective_adam
# ---------------------------------------------------------------------------

def test_selective_adam_freezes_zero_grad_rows():
    import optax
    from mojosplat_tpu import train as mtrain

    params = dict(
        means3d=jnp.ones((6, 3)),
        features=jnp.ones((6, 2, 3)),
        opacities_raw=jnp.ones((6,)),
    )
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    # Rows 0 and 3 got no gradient (culled / out of every tile).
    for k in grads:
        grads[k] = grads[k].at[0].set(0.0).at[3].set(0.0)

    opt = mtrain.selective_adam(1e-2)
    state = opt.init(params)
    for _ in range(3):
        updates, state = opt.update(grads, state, params)
        params = optax.apply_updates(params, updates)

    for k, v in params.items():
        moved = np.asarray(v != 1.0).reshape(6, -1).any(axis=1)
        assert not moved[0] and not moved[3], k
        assert moved[[1, 2, 4, 5]].all(), k
    # Moments of frozen rows stay zero.
    sba = state[0]
    for k in params:
        assert float(jnp.abs(sba.mu[k][0]).max()) == 0.0
        assert float(jnp.abs(sba.mu[k][1]).max()) > 0.0


def test_selective_adam_matches_adam_when_all_visible():
    import optax
    from mojosplat_tpu import train as mtrain

    params = dict(a=jnp.linspace(0, 1, 12).reshape(4, 3))
    grads = dict(a=jnp.full((4, 3), 0.5))
    sel, ada = mtrain.selective_adam(1e-2), optax.adam(1e-2)
    s1, s2 = sel.init(params), ada.init(params)
    u1, _ = sel.update(grads, s1, params)
    u2, _ = ada.update(grads, s2, params)
    np.testing.assert_allclose(np.asarray(u1["a"]), np.asarray(u2["a"]))
