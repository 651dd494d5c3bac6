"""Adaptive density control tests (fixed-capacity clone/split/prune).

The reference has no training, hence no densification; this is part of the
training subsystem our build introduces (SURVEY.md section 5, checkpoint /
training rows). Everything runs at static shapes on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mojosplat_tpu import Camera, RenderConfig
from mojosplat_tpu import train as mtrain
from mojosplat_tpu.densify import (
    DEAD_LOGIT,
    DensifyConfig,
    DensifyState,
    accumulate_stats,
    alive_mask,
    densify_and_prune,
    pad_to_capacity,
)


def small_params(n=16, seed=0):
    return mtrain.init_gaussians(jax.random.PRNGKey(seed), n, sh_degree=None)


class TestPadAndMask:
    def test_pad_to_capacity(self):
        p = small_params(8)
        padded = pad_to_capacity(p, 20)
        assert padded["means3d"].shape == (20, 3)
        assert int(jnp.sum(alive_mask(padded))) == 8

    def test_pad_shrink_raises(self):
        with pytest.raises(ValueError):
            pad_to_capacity(small_params(8), 4)


class TestDensify:
    def _run(self, params, grad_hot_idx, cfg=DensifyConfig()):
        n = params["opacities_raw"].shape[0]
        state = DensifyState.zero(n)
        g = jnp.zeros((n, 2)).at[grad_hot_idx, 0].set(1.0)  # big grads
        state = accumulate_stats(state, g, jnp.ones((n,), bool))
        return densify_and_prune(
            params, state, jax.random.PRNGKey(0), scene_extent=2.0,
            config=cfg,
        )

    def test_clone_small_gaussian_into_free_slot(self):
        params = pad_to_capacity(small_params(8), 16)
        params["scales"] = params["scales"].at[:].set(-6.0)  # tiny => clone
        new, state, m = self._run(params, grad_hot_idx=3)
        assert int(m["cloned"]) == 1 and int(m["split"]) == 0
        assert int(m["alive"]) == 9
        # the clone duplicates the parent's position
        clones = jnp.sum(
            jnp.all(new["means3d"] == new["means3d"][3], axis=-1)
            & alive_mask(new)
        )
        assert int(clones) == 2

    def test_split_large_gaussian(self):
        params = pad_to_capacity(small_params(8), 16)
        params["scales"] = params["scales"].at[:].set(1.0)  # huge => split
        old_mean = params["means3d"][5]
        new, state, m = self._run(params, grad_hot_idx=5)
        assert int(m["split"]) == 1 and int(m["cloned"]) == 0
        assert int(m["alive"]) == 9
        # parent shrank
        assert float(new["scales"][5, 0]) < 1.0
        # parent moved off its old center, child mirrors on the other side
        assert not bool(jnp.allclose(new["means3d"][5], old_mean))

    def test_prune_transparent(self):
        params = pad_to_capacity(small_params(8), 16)
        params["opacities_raw"] = params["opacities_raw"].at[2].set(-9.0)
        new, state, m = self._run(params, grad_hot_idx=())
        assert int(m["pruned"]) == 1
        assert not bool(alive_mask(new)[2])
        assert float(new["opacities_raw"][2]) == DEAD_LOGIT

    def test_no_free_slots_no_growth(self):
        params = small_params(8)  # full capacity, all alive
        params["scales"] = params["scales"].at[:].set(-6.0)
        new, state, m = self._run(params, grad_hot_idx=1)
        assert int(m["cloned"]) == 0 and int(m["split"]) == 0
        assert int(m["alive"]) == 8

    def test_jit_static_shapes(self):
        params = pad_to_capacity(small_params(8), 16)
        state = DensifyState.zero(16)
        fn = jax.jit(
            lambda p, s, k: densify_and_prune(p, s, k, scene_extent=2.0)
        )
        new, _, m = fn(params, state, jax.random.PRNGKey(0))
        assert new["means3d"].shape == params["means3d"].shape


class TestTrainingIntegration:
    def test_dead_slots_render_as_nothing(self):
        params = pad_to_capacity(small_params(6, seed=2), 12)
        p = mtrain.activate(dict(params))
        cam = Camera.create(R=jnp.eye(3), T=jnp.zeros(3), H=32, W=32,
                            fx=40.0, fy=40.0, cx=16.0, cy=16.0)
        from mojosplat_tpu import render_gaussians

        cfg = RenderConfig(tile_capacity=128, chunk_size=64, max_tile_span=4)
        img_padded = render_gaussians(
            p["means3d"], p["scales"], p["quats"], p["opacities"],
            p["features"], cam, config=cfg,
        )
        p6 = mtrain.activate(small_params(6, seed=2))
        img_live = render_gaussians(
            p6["means3d"], p6["scales"], p6["quats"], p6["opacities"],
            p6["features"], cam, config=cfg,
        )
        assert float(jnp.max(jnp.abs(img_padded - img_live))) < 1e-6

    def test_train_step_with_densify_stats(self):
        params = pad_to_capacity(small_params(10, seed=1), 16)
        # Place the live gaussians squarely in the camera frustum.
        params["means3d"] = params["means3d"].at[:10].set(
            jnp.array([[0.02 * i - 0.1, 0.015 * i - 0.05, 2.0 + 0.1 * i]
                       for i in range(10)])
        )
        opt = mtrain.make_optimizer(1e-2)
        state = mtrain.init_train_state(params, opt)
        dstate = DensifyState.zero(16)
        cam = Camera.create(
            R=jnp.broadcast_to(jnp.eye(3), (2, 3, 3)), T=jnp.zeros((2, 3)),
            H=32, W=32, fx=jnp.full((2,), 40.0), fy=jnp.full((2,), 40.0),
            cx=jnp.full((2,), 16.0), cy=jnp.full((2,), 16.0),
            near=jnp.full((2,), 0.1), far=jnp.full((2,), 100.0),
        )
        targets = jnp.full((2, 32, 32, 3), 0.5)
        cfg = RenderConfig(tile_capacity=128, chunk_size=64, max_tile_span=4)
        state2, dstate2, loss = mtrain.train_step_with_densify_stats(
            state, dstate, cam, targets, opt, config=cfg
        )
        assert jnp.isfinite(loss)
        assert int(jnp.sum(dstate2.count)) > 0  # visible gaussians counted
        assert float(jnp.max(dstate2.grad_accum)) > 0.0