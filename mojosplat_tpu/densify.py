"""Adaptive density control: clone / split / prune at fixed capacity.

Standard 3DGS training (INRIA) grows and shrinks the gaussian set during
optimization: under-reconstructed regions get gaussians cloned or split,
transparent ones are pruned. The reference has no training at all, so no
ADC either. On TPU the naive design (resize N every few hundred steps) would
recompile the entire pipeline; instead the parameter arrays have a FIXED
capacity N and an implicit alive mask (pruned gaussians get opacity logit
DEAD_LOGIT, which sigmoids to ~0 and is culled by the alpha threshold in
projection — they cost binning slots of zero tiles only). Clone/split
candidates are written into dead slots with one deterministic sort-based
slot assignment; every shape is static, nothing ever recompiles.

Densification statistics follow the original recipe: accumulate the norm of
the view-space (means2d) positional gradient per gaussian between densify
steps; candidates are those with mean accumulated gradient above a
threshold, cloned if small (max linear scale below a fraction of the scene
extent) and split if large (children sampled along the parent's principal
axis, scales shrunk by split_scale_factor).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

DEAD_LOGIT = -15.0  # sigmoid(-15) ~ 3e-7, far below the 1/255 alpha cull


@dataclasses.dataclass(frozen=True)
class DensifyConfig:
    grad_threshold: float = 2e-4  # mean view-space grad norm to densify
    percent_dense: float = 0.01  # small/large split point vs scene extent
    min_opacity: float = 0.005  # prune below this post-sigmoid opacity
    split_scale_factor: float = 1.6  # children scales = parent / this
    max_new_fraction: float = 0.25  # cap new gaussians per event


class DensifyState(NamedTuple):
    """Accumulated view-space gradient statistics between densify events."""

    grad_accum: jax.Array  # (N,) sum of ||d L / d means2d||
    count: jax.Array  # (N,) number of accumulation steps seen

    @staticmethod
    def zero(n: int) -> "DensifyState":
        return DensifyState(
            grad_accum=jnp.zeros((n,), jnp.float32),
            count=jnp.zeros((n,), jnp.int32),
        )


def alive_mask(params: dict[str, Any]) -> jax.Array:
    """(N,) bool: slots holding live gaussians."""
    return params["opacities_raw"] > DEAD_LOGIT + 1.0


def accumulate_stats(
    state: DensifyState, means2d_grad: jax.Array, visible: jax.Array
) -> DensifyState:
    """Add one step's view-space positional gradients.

    means2d_grad: (N, 2) dL/d means2d (e.g. the cotangent of a zero
    view-space offset parameter). visible: (N,) bool, gaussians that
    actually rendered this step (radii > 0).
    """
    norms = jnp.linalg.norm(means2d_grad, axis=-1)
    return DensifyState(
        grad_accum=state.grad_accum + jnp.where(visible, norms, 0.0),
        count=state.count + visible.astype(jnp.int32),
    )


def densify_and_prune(
    params: dict[str, Any],
    state: DensifyState,
    key: jax.Array,
    scene_extent: float | jax.Array,
    config: DensifyConfig = DensifyConfig(),
) -> tuple[dict[str, Any], DensifyState, dict[str, jax.Array]]:
    """One densification event at fixed capacity.

    Returns (new params with identical shapes, reset stats, metrics dict
    with cloned/split/pruned/alive counts). Fully jittable; deterministic
    given the PRNG key.
    """
    n = params["opacities_raw"].shape[0]
    alive = alive_mask(params)
    opac = jax.nn.sigmoid(params["opacities_raw"])

    # ---- prune: transparent gaussians release their slots.
    prune = alive & (opac < config.min_opacity)
    alive_after_prune = alive & ~prune

    # ---- candidates: high mean view-space gradient.
    mean_grad = state.grad_accum / jnp.maximum(state.count, 1)
    hot = alive_after_prune & (mean_grad > config.grad_threshold)
    max_scale = jnp.exp(jnp.max(params["scales"], axis=-1))
    small = max_scale <= config.percent_dense * scene_extent
    clone_c = hot & small
    split_c = hot & ~small

    # ---- slot budget: rank candidates by gradient, rank free slots, and
    # pair the i-th best candidate with the i-th free slot (one argsort
    # each; everything static).
    free = ~alive_after_prune
    n_free = jnp.sum(free)
    max_new = jnp.minimum(
        n_free, jnp.int32(config.max_new_fraction * n)
    )

    cand = clone_c | split_c
    order = jnp.argsort(jnp.where(cand, -mean_grad, jnp.inf))  # best first
    rank_of = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32)
    )
    n_cand = jnp.sum(cand)
    selected = cand & (rank_of < max_new)

    free_order = jnp.argsort(~free)  # free slots first, stable
    n_new = jnp.minimum(jnp.minimum(n_cand, max_new), n_free).astype(
        jnp.int32
    )
    # destination slot for the candidate with rank r is free_order[r].
    dest = free_order[jnp.clip(rank_of, 0, n - 1)]
    write = selected & (rank_of < n_new)

    # ---- child parameters.
    quats = params["quats"] / jnp.maximum(
        jnp.linalg.norm(params["quats"], axis=-1, keepdims=True), 1e-12
    )
    R = _quat_to_rotmat(quats)  # (N, 3, 3)
    scales_lin = jnp.exp(params["scales"])
    # Principal axis = column of R for the largest scale.
    main_axis = jnp.take_along_axis(
        R, jnp.argmax(params["scales"], axis=-1)[:, None, None], axis=2
    )[..., 0]
    sigma = jnp.max(scales_lin, axis=-1, keepdims=True)
    offset = (
        jax.random.normal(key, (n, 1)) * sigma * main_axis
    )  # sample along the principal axis

    is_split = split_c
    child_means = jnp.where(
        is_split[:, None], params["means3d"] + offset, params["means3d"]
    )
    child_scales = jnp.where(
        is_split[:, None],
        params["scales"] - jnp.log(config.split_scale_factor),
        params["scales"],
    )

    def place(dst, src):
        return dst.at[jnp.where(write, dest, n)].set(src, mode="drop")

    new_params = dict(params)
    new_params["means3d"] = place(params["means3d"], child_means)
    new_params["scales"] = place(params["scales"], child_scales)
    new_params["quats"] = place(params["quats"], params["quats"])
    new_params["opacities_raw"] = place(
        params["opacities_raw"], params["opacities_raw"]
    )
    new_params["features"] = place(params["features"], params["features"])

    # Split parents also shrink in place (the original replaces the parent
    # with two children; at fixed capacity the parent IS child one).
    shrink = is_split & write
    new_params["means3d"] = jnp.where(
        shrink[:, None],
        params["means3d"] - offset,
        new_params["means3d"],
    )
    new_params["scales"] = jnp.where(
        shrink[:, None], child_scales, new_params["scales"]
    )

    # Pruned slots die.
    new_params["opacities_raw"] = jnp.where(
        prune, DEAD_LOGIT, new_params["opacities_raw"]
    )

    metrics = dict(
        pruned=jnp.sum(prune),
        cloned=jnp.sum(write & clone_c),
        split=jnp.sum(write & split_c),
        alive=jnp.sum(alive_mask(new_params)),
    )
    return new_params, DensifyState.zero(n), metrics


def _quat_to_rotmat(q):
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                       2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                       2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                       1 - 2 * (x * x + y * y)], -1),
        ],
        axis=1,
    )


def pad_to_capacity(params: dict[str, Any], capacity: int) -> dict[str, Any]:
    """Grow parameter arrays to ``capacity`` slots; new slots are dead."""
    n = params["opacities_raw"].shape[0]
    if capacity < n:
        raise ValueError(f"capacity {capacity} < current N {n}")
    pad = capacity - n
    out = {}
    for k, v in params.items():
        padded = jnp.pad(v, [(0, pad)] + [(0, 0)] * (v.ndim - 1))
        out[k] = padded
    out["opacities_raw"] = out["opacities_raw"].at[n:].set(DEAD_LOGIT)
    return out
