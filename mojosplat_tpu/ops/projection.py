"""EWA projection of 3D Gaussians to 2D screen-space conics (pure JAX).

Implements the same math as the reference's three projection backends
(/root/reference/mojosplat/projection.py:51-283 torch backend,
kernels/projection.mojo:13-257 mojo kernel, and the external gsplat
``fully_fused_projection``), fully vectorized over N so XLA maps it onto the
VPU/MXU — no per-gaussian scalar loop (the reference launches one GPU thread
per gaussian, projection.mojo:308-310; on TPU the idiomatic form is one fused
elementwise program over (N,) arrays).

Numerical contract (gsplat parity, see config.py):
  - quaternion (w,x,y,z) normalized then converted to a rotation matrix
    (projection.py:51-69)
  - covariance = (R S)(R S)^T with S = diag(scales); the public API takes
    log-scales and applies exp() (projection.py:317-318)
  - world->cam: mean_c = R_v mean + t; cov_c = R_v cov R_v^T (projection.py:163-196)
  - perspective EWA with the 0.3*tan_fov guard-band clamp (projection.py:143-148)
  - eps2d dilation of cov2d, det clamped to 1e-10, conic = inverse upper
    triangle (projection.py:242-262)
  - opacity-aware radius extend = min(3.33, sqrt(2 ln(opacity/alpha_thresh)))
    (projection.mojo:214-226; gsplat CUDA semantics) or the torch backend's
    plain 3.33 (projection.py:266-267) when config.opacity_aware_radius=False
  - culling: det>0, near<depth<far (projection.py:271), opacity>=1/255
    (projection.mojo:74-87), radius<=radius_clip, viewport overlap test
    (projection.py:274-280) — all expressed as masks that zero the radii, so
    shapes stay static and the whole stage is differentiable.

Differentiability (the capability the reference lacks entirely — render.py:11
is @torch.no_grad()): every output except the integer radii carries gradients;
culling masks are applied with jnp.where on forward values only.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..camera import Camera
from ..config import DEFAULT_CONFIG, RenderConfig


class ProjectionResult(NamedTuple):
    """Outputs of the projection stage (projection.py:33-38).

    means2d: (N, 2) pixel-space centers.
    conics:  (N, 3) inverse 2D covariance upper triangle [a, b, c].
    depths:  (N,)   camera-space z of each center.
    radii:   (N, 2) integer conservative pixel radii (0 => culled).
    """

    means2d: jax.Array
    conics: jax.Array
    depths: jax.Array
    radii: jax.Array


def quat_to_rotmat(quats: jax.Array) -> jax.Array:
    """(..., 4) wxyz quaternions -> (..., 3, 3) rotation matrices.

    Matches _quat_to_rotmat (projection.py:51-69) including the normalize-first
    convention (F.normalize with eps=1e-12).
    """
    norm = jnp.linalg.norm(quats, axis=-1, keepdims=True)
    q = quats / jnp.maximum(norm, 1e-12)
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    R = jnp.stack(
        [
            1 - 2 * (y**2 + z**2),
            2 * (x * y - w * z),
            2 * (x * z + w * y),
            2 * (x * y + w * z),
            1 - 2 * (x**2 + z**2),
            2 * (y * z - w * x),
            2 * (x * z - w * y),
            2 * (y * z + w * x),
            1 - 2 * (x**2 + y**2),
        ],
        axis=-1,
    )
    return R.reshape(quats.shape[:-1] + (3, 3))


def quat_scale_to_covar(quats: jax.Array, scales: jax.Array) -> jax.Array:
    """3D covariance Sigma = (R S)(R S)^T from wxyz quats and *linear* scales.

    Matches _quat_scale_to_covar_preci with compute_covar=True
    (projection.py:83-87).
    """
    R = quat_to_rotmat(quats)  # (..., 3, 3)
    M = R * scales[..., None, :]  # R @ diag(s)
    return jnp.einsum("...ij,...kj->...ik", M, M, precision="highest")


def world_to_cam(
    means: jax.Array,  # (N, 3)
    covars: jax.Array,  # (N, 3, 3)
    viewmat: jax.Array,  # (4, 4)
) -> tuple[jax.Array, jax.Array]:
    """Transform gaussian means/covariances into camera space
    (projection.py:163-196, single-camera specialization)."""
    R = viewmat[:3, :3]
    t = viewmat[:3, 3]
    means_c = jnp.einsum("ij,nj->ni", R, means, precision="highest") + t
    covars_c = jnp.einsum("ij,njk,lk->nil", R, covars, R, precision="highest")
    return means_c, covars_c


def persp_proj(
    means_c: jax.Array,  # (N, 3) camera-space means
    covars_c: jax.Array,  # (N, 3, 3) camera-space covariances
    fx,
    fy,
    cx,
    cy,
    width: int,
    height: int,
) -> tuple[jax.Array, jax.Array]:
    """Perspective EWA projection (projection.py:105-160).

    Returns (means2d (N,2), cov2d (N,2,2)).
    """
    tx, ty, tz = means_c[:, 0], means_c[:, 1], means_c[:, 2]
    # Guard against division by zero for gaussians at/behind the camera plane;
    # such gaussians are culled by the near-plane mask downstream, so the value
    # here only needs to be finite.
    tz_safe = jnp.where(jnp.abs(tz) < 1e-8, 1e-8, tz)
    tz2 = tz_safe * tz_safe

    tan_fovx = 0.5 * width / fx
    tan_fovy = 0.5 * height / fy
    lim_x_pos = (width - cx) / fx + 0.3 * tan_fovx
    lim_x_neg = cx / fx + 0.3 * tan_fovx
    lim_y_pos = (height - cy) / fy + 0.3 * tan_fovy
    lim_y_neg = cy / fy + 0.3 * tan_fovy
    tx_c = tz_safe * jnp.clip(tx / tz_safe, -lim_x_neg, lim_x_pos)
    ty_c = tz_safe * jnp.clip(ty / tz_safe, -lim_y_neg, lim_y_pos)

    O = jnp.zeros_like(tz)
    J = jnp.stack(
        [fx / tz_safe, O, -fx * tx_c / tz2, O, fy / tz_safe, -fy * ty_c / tz2],
        axis=-1,
    ).reshape(-1, 2, 3)

    cov2d = jnp.einsum("nij,njk,nlk->nil", J, covars_c, J, precision="highest")
    means2d = jnp.stack(
        [fx * tx / tz_safe + cx, fy * ty / tz_safe + cy], axis=-1
    )
    return means2d, cov2d


def project_gaussians(
    means3d: jax.Array,  # (N, 3) world-space centers
    scales: jax.Array,  # (N, 3) log-space scales
    quats: jax.Array,  # (N, 4) wxyz quaternions
    opacities: jax.Array,  # (N,) post-activation opacities
    camera: Camera,
    config: RenderConfig = DEFAULT_CONFIG,
) -> ProjectionResult:
    """Project 3D gaussians to screen space with culling.

    Same public signature role as project_gaussians (projection.py:15-48), with
    the backend dispatch replaced by a single TPU-native implementation.
    """
    covars = quat_scale_to_covar(quats, jnp.exp(scales))  # (N, 3, 3)
    means_c, covars_c = world_to_cam(means3d, covars, camera.view_matrix)
    means2d, cov2d = persp_proj(
        means_c, covars_c, camera.fx, camera.fy, camera.cx, camera.cy,
        camera.W, camera.H,
    )

    depths = means_c[:, 2]

    # eps2d dilation (projection.py:242) and determinant clamp (:248).
    c00 = cov2d[:, 0, 0] + config.eps2d
    c11 = cov2d[:, 1, 1] + config.eps2d
    c01 = cov2d[:, 0, 1]
    c10 = cov2d[:, 1, 0]
    det = jnp.maximum(c00 * c11 - c01 * c10, 1e-10)

    conics = jnp.stack(
        [c11 / det, -(c01 + c10) / 2.0 / det, c00 / det], axis=-1
    )

    # Radius: opacity-aware (projection.mojo:214-226 / gsplat CUDA) or the
    # plain 3.33-sigma variant (projection.py:266-267).
    if config.opacity_aware_radius:
        safe_op = jnp.maximum(opacities, config.alpha_threshold)
        extend = jnp.minimum(
            config.radius_extend,
            jnp.sqrt(2.0 * jnp.log(safe_op / config.alpha_threshold)),
        )
    else:
        extend = config.radius_extend
    radius_x = jnp.ceil(extend * jnp.sqrt(jnp.maximum(c00, 0.0)))
    radius_y = jnp.ceil(extend * jnp.sqrt(jnp.maximum(c11, 0.0)))

    # Culling masks (projection.py:271-280 + projection.mojo:74-87,228-244).
    valid = (det > 0) & (depths > camera.near) & (depths < camera.far)
    if config.opacity_aware_radius:
        valid &= opacities >= config.alpha_threshold
    valid &= ~(
        (radius_x <= config.radius_clip) & (radius_y <= config.radius_clip)
    )
    inside = (
        (means2d[:, 0] + radius_x > 0)
        & (means2d[:, 0] - radius_x < camera.W)
        & (means2d[:, 1] + radius_y > 0)
        & (means2d[:, 1] - radius_y < camera.H)
    )
    keep = valid & inside

    radius = jnp.stack([radius_x, radius_y], axis=-1)
    radius = jnp.where(keep[:, None], radius, 0.0)
    radii = jax.lax.stop_gradient(radius).astype(jnp.int32)

    return ProjectionResult(
        means2d=means2d, conics=conics, depths=depths, radii=radii
    )
