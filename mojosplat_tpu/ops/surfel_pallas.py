"""Pallas TPU rasterization kernels for the 2DGS surfel family.

Same tiled-blend scaffolding as the 3DGS kernels (ops/raster_pallas.py —
grid step per tile group, pixels on sublanes x surfels on lanes, VMEM chunk
slices, carried transmittance with chunk-level early exit, sign-packed
per-chunk transmittance residuals for a re-walk-free backward, MXU color
matmul, sort + banded-MXU gradient routing), with the per-chunk geometry
replaced by the exact ray/disk intersection response of surfel.py.

Field packing (16 rows, field-major like the 3DGS kernels' 10):

    0-2   qc0', qc1', qc2      with qc0' = fx qc0 + cx qc2 (y analogously)
    3-5   a0',  a1',  a2       a0' = fx a0 + cx a2, a1' = fy a1 + cy a2
    6-8   b0',  b1',  b2
    9-10  c2x,  c2y            projected center (pixels)
    11    opacity
    12-14 rgb
    15    zero pad             (aux mode: 15-17 = camera-frame normals,
                                18 rows total)

The aux kernel variant (raster_surfel_tiles_pallas(..., aux=True)) also
blends the per-pixel ray/disk INTERSECTION depth moments m1 = sum(w z),
m2 = sum(w z^2) (z from the unprimed 2-components: z = qc2 + u a2 + v b2)
and the constant normal rows — the full 2DGS output surface (depth /
normal / distortion maps) in the same single pass, fwd + hand-derived bwd.

The primes fold the intrinsics into the per-surfel rows (row-scaling the
2x2 system by fx/fy leaves its solution invariant), so the kernel needs
only raw pixel coordinates — no camera scalars cross the kernel boundary,
and the prime computation stays in XLA where autodiff maps the gradients
back to raw parameters.

Per chunk, with pixel (px, py):

    A11 = a0' - px a2   A12 = b0' - px b2   r1 = px qc2 - qc0'
    A21 = a1' - py a2   A22 = b1' - py b2   r2 = py qc2 - qc1'
    (u, v) = A^-1 r ;  g_surf = exp(-(u^2+v^2)/2) [masked on |det| ~ 0]
    g_filt = exp(-((px-c2x)^2 + (py-c2y)^2) / (2 * 0.5))
    alpha  = min(op * max(g_surf, g_filt), max_alpha), kept >= 1/255

The backward hand-derives the 2x2-solve adjoint (d_r = A^-T d_q,
d_A = -d_r q^T) and reduces per-surfel gradients over pixels, exactly
mirroring surfel.py's XLA math (the oracle for these kernels).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .raster_pallas import (
    _CCOLS,
    _OCOLS,
    _chunk_rows,
    _dot3,
    _gather_rows,
    _lane_col,
    _lane_cumprod,
    _lane_excl,
    _lane_rev_cumsum_excl,
    _pad_tiles,
    _tile_pixel_centers,
)

_SROWS = 16
_FILTER_SIGMA2 = 0.5  # keep in sync with surfel._FILTER_SIGMA2
_DET_EPS = 1e-9
_S2_MAX = 1e4


def _surfel_chunk_geometry(g, k, K, px, py, count, config, aux=False):
    """Per-chunk surfel response: (P, K) alpha + backward ingredients.

    With ``aux`` also computes the per-pixel ray/disk intersection depth
    z = qc2 + u a2 + v b2 (falling back to the center depth qc2 where the
    low-pass filter dominates or the ray is parallel to the disk), exactly
    mirroring surfel._surfel_alphas(with_depth=True).
    """
    qc0, qc1, qc2 = g[0:1, :], g[1:2, :], g[2:3, :]
    a0, a1, a2 = g[3:4, :], g[4:5, :], g[5:6, :]
    b0, b1, b2 = g[6:7, :], g[7:8, :], g[8:9, :]
    c2x, c2y = g[9:10, :], g[10:11, :]
    op = g[11:12, :]

    A11 = a0 - px * a2  # (P, K)
    A12 = b0 - px * b2
    A21 = a1 - py * a2
    A22 = b1 - py * b2
    r1 = px * qc2 - qc0
    r2 = py * qc2 - qc1

    det = A11 * A22 - A12 * A21
    ok = jnp.abs(det) > _DET_EPS
    det_safe = jnp.where(ok, det, 1.0)
    u = (r1 * A22 - r2 * A12) / det_safe
    v = (A11 * r2 - A21 * r1) / det_safe
    s2 = jnp.minimum(u * u + v * v, _S2_MAX)
    g_surf = jnp.where(ok, jnp.exp(-0.5 * s2), 0.0)

    dx = px - c2x
    dy = py - c2y
    g_filt = jnp.exp(-(dx * dx + dy * dy) / (2.0 * _FILTER_SIGMA2))
    gm = jnp.maximum(g_surf, g_filt)

    raw = op * gm
    alpha = jnp.minimum(raw, config.max_alpha)
    col = _lane_col(K)  # (1, K); lane masks broadcast against (P, K)
    keep = (alpha >= config.alpha_threshold) & (col + k * K < count)
    alpha = jnp.where(keep, alpha, 0.0)
    geo = dict(
        A11=A11, A12=A12, A21=A21, A22=A22, det_safe=det_safe, ok=ok,
        u=u, v=v, s2=s2, g_surf=g_surf, g_filt=g_filt, gm=gm, dx=dx, dy=dy,
        op=op, raw=raw, keep=keep, px=px, py=py,
    )
    if aux:
        use_surf = ok & (g_surf >= g_filt)
        z = jnp.where(use_surf, qc2 + u * a2 + v * b2, qc2)
        geo["use_surf"] = use_surf
        geo["z"] = z
        geo["a2"] = a2
        geo["b2"] = b2
    return alpha, geo


def _fwd_kernel(counts_ref, pdata_ref, out_ref, thist_ref,
                t_s, done_s, acc_s, *, K, P, ts, tw, tps, config, aux):
    tt = pl.program_id(0)
    eps = config.transmittance_eps
    cap = pdata_ref.shape[1] // tps
    thist_ref[...] = jnp.full_like(thist_ref, -1.0)
    # aux mode: constants are rgb(12:15) + normals(15:18) and two per-pixel
    # moment columns (z, z^2) of the intersection depth are accumulated
    # alongside; acc layout [rgb(3), n(3), m1, m2]. Plain mode: [rgb, pad].
    nacc = 8 if aux else _CCOLS

    for i in range(tps):
        t = tt * tps + i
        count = counts_ref[t]
        px, py = _tile_pixel_centers(t, ts, tw, P)

        t_s[...] = jnp.ones((P, 1), jnp.float32)
        done_s[...] = jnp.zeros((P, 1), jnp.float32)
        acc_s[...] = jnp.zeros((P, nacc), jnp.float32)

        for k in range(cap // K):
            guard = (k * K < count) & (jnp.min(done_s[...]) == 0.0)

            @pl.when(guard)
            def _(k=k, i=i, count=count, px=px, py=py):
                t_in = t_s[...]
                done = done_s[...]
                # Chunk-major (nc, P): unpadded HBM tiling (see
                # raster_pallas._fwd_kernel for the layout rationale).
                thist_ref[i, k : k + 1, :] = jnp.where(
                    done == 0.0, t_in, -t_in
                ).T
                g = _chunk_rows(pdata_ref, i * (cap // K) + k, K)
                alpha, geo = _surfel_chunk_geometry(
                    g, k, K, px, py, count, config, aux=aux
                )
                col = _lane_col(K)
                cum = _lane_cumprod(1.0 - alpha, col, K)
                t_after = t_in * cum
                alive = done == 0.0
                applied = (t_after > eps) & alive
                eff = jnp.where(applied, alpha, 0.0)
                excl = _lane_excl(cum, col, 1.0)
                w = eff * t_in * excl

                if aux:
                    cols_t = g[12:18, :]  # rgb + normals
                    z = geo["z"]
                    wz = jnp.sum(w * z, axis=1, keepdims=True)
                    wz2 = jnp.sum(w * z * z, axis=1, keepdims=True)
                    pix = jnp.concatenate([wz, wz2], axis=1)
                else:
                    cols_t = g[12:16, :]  # rgb + zero pad row
                # 3-pass bf16-split blend: half HIGHEST's MXU cost at
                # ~2^-17 relative error (see raster_pallas._dot3).
                mm = _dot3(w, cols_t, (((1,), (1,)), ((), ())))
                if aux:
                    mm = jnp.concatenate([mm, pix], axis=1)
                acc_s[...] = acc_s[...] + mm
                t_s[...] = jnp.min(
                    jnp.where(applied, t_after, t_in), axis=1, keepdims=True
                )
                done_s[...] = jnp.maximum(
                    done,
                    (t_after[:, K - 1 : K] <= eps).astype(jnp.float32),
                )

        # Channel-major (oc, P) write: one in-register transpose per tile
        # buys an unpadded HBM layout for the output and its cotangent.
        out_ref[i, :, :] = jnp.concatenate(
            [acc_s[...], t_s[...]], axis=1
        ).T


def _bwd_kernel(counts_ref, pdata_ref, gout_ref, thist_ref,
                dpdata_ref, gt_s, *, K, P, ts, tw, tps, config, aux):
    grad_precision = (
        jax.lax.Precision.DEFAULT
        if config.grad_route_bf16
        else jax.lax.Precision.HIGHEST
    )
    tt = pl.program_id(0)
    eps = config.transmittance_eps
    cap = pdata_ref.shape[1] // tps
    nchunks_max = cap // K
    ncc = 6 if aux else _CCOLS  # constant (matmul-blended) channels

    # Strict upper-triangular ones: one MXU dot computes the exclusive
    # reverse lane cumsum in the fast-gradient mode (see raster_pallas
    # _bwd_kernel); the exact mode keeps the VPU Hillis-Steele scan.
    rev_tri = (
        jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
        > jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    ).astype(jnp.float32)

    dpdata_ref[...] = jnp.zeros_like(dpdata_ref)

    for i in range(tps):
        t = tt * tps + i
        count = counts_ref[t]
        px, py = _tile_pixel_centers(t, ts, tw, P)

        gout = gout_ref[i, :, :]  # channel-major (_OCOLS or 9, P)
        v_cot = gout[:ncc, :]  # (ncc, P)
        if aux:
            v_z = gout[6:7, :].T  # (P, 1)
            v_z2 = gout[7:8, :].T
        gt_s[...] = gout[ncc + (2 if aux else 0) :][:1, :].T

        for k in reversed(range(nchunks_max)):
            th = thist_ref[i, k : k + 1, :].T  # (P, 1) signed T_in

            @pl.when((k * K < count) & (jnp.max(th) > 0.0))
            def _(k=k, i=i, th=th, v_cot=v_cot, count=count, px=px, py=py):
                t_in = jnp.abs(th)
                gt = gt_s[...]
                g = _chunk_rows(pdata_ref, i * nchunks_max + k, K)
                alpha, geo = _surfel_chunk_geometry(
                    g, k, K, px, py, count, config, aux=aux
                )
                col = _lane_col(K)
                cum = _lane_cumprod(1.0 - alpha, col, K)
                t_after = t_in * cum
                applied = (t_after > eps) & (th > 0.0)
                eff = jnp.where(applied, alpha, 0.0)
                ome = 1.0 - eff
                excl = _lane_excl(cum, col, 1.0)
                t_before = t_in * excl
                w = eff * t_before
                cum_last = jnp.min(
                    jnp.where(applied, cum, 1.0), axis=1, keepdims=True
                )
                t_out = t_in * cum_last

                cols_t = g[12 : 12 + ncc, :]
                # cv[p, j] = sum_c v_cot[c, p] * cols_t[c, j]
                cv = jax.lax.dot_general(
                    v_cot, cols_t, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=grad_precision,
                )  # (P, K)
                if aux:
                    # Per-pixel moment channels ride the same blend weight:
                    # contribution w * (v_z z + v_z2 z^2).
                    z = geo["z"]
                    cv = cv + v_z * z + v_z2 * z * z
                # d_cols_t[c, j] = sum_p v_cot[c, p] * w[p, j]
                d_cols_t = jax.lax.dot_general(
                    v_cot, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=grad_precision,
                )  # (ncc, K)

                q = w * cv
                if config.grad_route_bf16:
                    S = jax.lax.dot_general(
                        q, rev_tri, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=grad_precision,
                    )
                else:
                    S = _lane_rev_cumsum_excl(q, col, K)
                d_eff = cv * t_before - (S + gt * t_out) / ome
                d_alpha = jnp.where(applied, d_eff, 0.0)
                d_raw = jnp.where(
                    geo["keep"] & (geo["raw"] < config.max_alpha),
                    d_alpha, 0.0,
                )

                # ---- surfel response adjoint (mirrors surfel.py math).
                d_op2 = d_raw * geo["gm"]  # (P, K)
                d_gm = d_raw * geo["op"]
                surf_sel = geo["g_surf"] >= geo["g_filt"]
                d_gsurf = jnp.where(surf_sel, d_gm, 0.0)
                d_gfilt = jnp.where(surf_sel, 0.0, d_gm)

                # g_filt branch -> projected center.
                gf = d_gfilt * geo["g_filt"] / _FILTER_SIGMA2
                d_c2x = gf * geo["dx"]
                d_c2y = gf * geo["dy"]

                # g_surf branch -> 2x2 solve adjoint.
                d_s2 = jnp.where(
                    geo["ok"] & (geo["s2"] < _S2_MAX),
                    -0.5 * d_gsurf * geo["g_surf"], 0.0,
                )
                d_u = d_s2 * 2.0 * geo["u"]
                d_v = d_s2 * 2.0 * geo["v"]
                if aux:
                    # Intersection-depth chain: z enters the loss through
                    # the per-pixel moment channels (weight w per slot);
                    # z = qc2 + u a2 + v b2 on use_surf lanes, qc2 otherwise
                    # (dz/dqc2 = 1 in both branches).
                    z = geo["z"]
                    d_z = w * (v_z + 2.0 * z * v_z2)  # (P, K)
                    d_zs = jnp.where(geo["use_surf"], d_z, 0.0)
                    d_u = d_u + d_zs * geo["a2"]
                    d_v = d_v + d_zs * geo["b2"]
                det = geo["det_safe"]
                d_r1 = (geo["A22"] * d_u - geo["A21"] * d_v) / det
                d_r2 = (-geo["A12"] * d_u + geo["A11"] * d_v) / det
                d_A11 = -d_r1 * geo["u"]
                d_A12 = -d_r1 * geo["v"]
                d_A21 = -d_r2 * geo["u"]
                d_A22 = -d_r2 * geo["v"]

                def rsum(x):
                    return jnp.sum(x, axis=0, keepdims=True)  # (1, K)

                d_qc2 = px * d_r1 + py * d_r2
                d_a2 = -px * d_A11 - py * d_A21
                d_b2 = -px * d_A12 - py * d_A22
                if aux:
                    d_qc2 = d_qc2 + d_z
                    d_a2 = d_a2 + d_zs * geo["u"]
                    d_b2 = d_b2 + d_zs * geo["v"]
                d_g = jnp.concatenate(
                    [
                        rsum(-d_r1),  # qc0'
                        rsum(-d_r2),  # qc1'
                        rsum(d_qc2),  # qc2
                        rsum(d_A11),  # a0'
                        rsum(d_A21),  # a1'
                        rsum(d_a2),  # a2
                        rsum(d_A12),  # b0'
                        rsum(d_A22),  # b1'
                        rsum(d_b2),  # b2
                        rsum(d_c2x),
                        rsum(d_c2y),
                        rsum(d_op2),  # opacity
                        d_cols_t,  # rgb + pad (4, K) / rgb + normals (6, K)
                    ],
                    axis=0,
                )  # (16 or 18, K)
                sl0 = (i * nchunks_max + k) * K
                dpdata_ref[:, sl0 : sl0 + K] = d_g

                gt_s[...] = (
                    jnp.sum(eff * excl * cv, axis=1, keepdims=True)
                    + gt * cum_last
                )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def raster_surfel_tiles_pallas(pdata, counts, ts, tw, config, aux=False):
    """Blend each tile's gathered surfels front-to-back.

    pdata: (16, n_tiles*cap) f32 field-major rows (see module docstring);
    returns channel-major (n_tiles, 5, ts*ts): rgb, zero aux, final
    transmittance (pixels on lanes — unpadded HBM tiling, see
    raster_pallas.raster_tiles_pallas).

    ``aux=True`` (static): pdata is 18 rows (rgb at 12:15, camera-frame
    viewer-oriented normals at 15:18) and the output widens to
    (n_tiles, 9, ts*ts): rgb(0:3), blended normals(3:6), intersection-depth
    moments m1 = sum(w z) (6) and m2 = sum(w z^2) (7), transmittance (8) —
    everything render_surfels' depth/normal/distortion maps need, in the
    same single pass.
    """
    return _fwd_call(pdata, counts, ts, tw, config, aux)[0]


def _fwd_call(pdata, counts, ts, tw, config, aux=False):
    n_tiles = counts.shape[0]
    cap = pdata.shape[1] // n_tiles
    P = ts * ts
    K = config.pallas_chunk
    tps = config.pallas_tiles_per_step
    if cap % K != 0:
        raise ValueError(f"tile_capacity {cap} % pallas_chunk {K} != 0")
    pdata, counts, n_pad = _pad_tiles(pdata, counts, cap, tps)
    nc = cap // K
    rows = pdata.shape[0]
    oc = 9 if aux else _OCOLS

    kernel = functools.partial(
        _fwd_kernel, K=K, P=P, ts=ts, tw=tw, tps=tps, config=config, aux=aux
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // tps,),
        in_specs=[
            pl.BlockSpec((rows, tps * cap), lambda t, c: (0, t)),
        ],
        out_specs=[
            pl.BlockSpec((tps, oc, P), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((tps, nc, P), lambda t, c: (t, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((P, 1), jnp.float32),
            pltpu.VMEM((P, 1), jnp.float32),
            pltpu.VMEM((P, 8 if aux else _CCOLS), jnp.float32),
        ],
    )
    out, thist = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, oc, P), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, nc, P), jnp.float32),
        ],
        interpret=config.pallas_interpret,
    )(counts, pdata)
    return out[:n_tiles], thist


def _fwd_rule(pdata, counts, ts, tw, config, aux=False):
    out, thist = _fwd_call(pdata, counts, ts, tw, config, aux)
    return out, (pdata, counts, thist)


def _bwd_rule(ts, tw, config, aux, residuals, gout):
    pdata, counts, thist = residuals
    n_tiles = counts.shape[0]
    cap = pdata.shape[1] // n_tiles
    P = ts * ts
    K = config.pallas_chunk
    tps = config.pallas_tiles_per_step
    pdata, counts, n_pad = _pad_tiles(pdata, counts, cap, tps)
    nc = cap // K
    rows = pdata.shape[0]
    oc = 9 if aux else _OCOLS
    if n_pad != n_tiles:
        gout = jnp.pad(gout, ((0, n_pad - n_tiles), (0, 0), (0, 0)))

    kernel = functools.partial(
        _bwd_kernel, K=K, P=P, ts=ts, tw=tw, tps=tps, config=config, aux=aux
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // tps,),
        in_specs=[
            pl.BlockSpec((rows, tps * cap), lambda t, c: (0, t)),
            pl.BlockSpec((tps, oc, P), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((tps, nc, P), lambda t, c: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((rows, tps * cap), lambda t, c: (0, t)),
        scratch_shapes=[
            pltpu.VMEM((P, 1), jnp.float32),
        ],
    )
    d_pdata = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows, n_pad * cap), jnp.float32),
        interpret=config.pallas_interpret,
    )(counts, pdata, gout, thist)
    d_pdata = d_pdata[:, : n_tiles * cap]
    d_counts = np.zeros(counts.shape, dtype=jax.dtypes.float0)
    return d_pdata, d_counts


raster_surfel_tiles_pallas.defvjp(_fwd_rule, _bwd_rule)


def gather_surfel_tile_data(columns, slot_gids, interpret=False,
                            route_bf16=False):
    """Stack per-surfel field columns, gather by slot ids.

    ``columns``: sequence of (N,) field columns [qc'(3), a'(3), b'(3),
    c2(2), op, rgb(C), normals(3) for the aux variant] with the intrinsics
    already folded in (see primed_surfel_columns). Kept as 1D columns right
    up to one field-major (rows, N) stack so no per-gaussian intermediate
    (nor the stack's split adjoints) ever materializes with a padded
    (N, c<128) layout. Same one-wide-row-gather + sort-based adjoint as the
    3DGS path (_gather_rows).
    """
    nconst = len(columns)
    N = columns[0].shape[0]
    rows = max(_SROWS, nconst)
    cols = [c.astype(jnp.float32) for c in columns]
    cols += [jnp.zeros((N,), jnp.float32)] * (rows - nconst)
    packed = jnp.stack(cols, axis=0)  # (16 or 18, N) field-major
    safe = jnp.clip(slot_gids.reshape(-1), 0, N - 1)
    return _gather_rows(
        packed, safe, interpret, route_bf16, nconst
    )  # (16 or 18, n_tiles*cap)


def primed_surfel_columns(columns, camera):
    """Fold the intrinsics into the 12 surfel field columns (see module
    doc).

    ``columns`` is surfel.surfel_alpha_columns's output: [qc(3), a(3),
    b(3), c2(2), op], each (N,). Row-scaling the ray/disk system by fx
    (x-eq) and fy (y-eq) leaves (u, v) invariant and removes all camera
    scalars from the kernel.

    For ``camera_model == "ortho"`` the parallel-ray system
    ``u a_x + v b_x = xn - qc_x`` lands in the same kernel form
    ``A11 = a0' - px a2, r1 = px qc2 - qc0'`` by priming with z-slots
    (qc2, a2, b2) = (1, 0, 0): A11 = fx a_x and r1 = px - (fx qc_x + cx) =
    fx (xn - qc_x) — the same fx row scaling. (This is why the aux kernel's
    intersection depth, which reads those z rows, is pinhole-only.)
    """
    (qcx, qcy, qcz, ax, ay, az, bx, by, bz, c2x, c2y, op) = columns

    if camera.camera_model == "ortho":
        one = jnp.ones_like(qcz)
        zero = jnp.zeros_like(qcz)
        return (camera.fx * qcx + camera.cx, camera.fy * qcy + camera.cy,
                one,
                camera.fx * ax, camera.fy * ay, zero,
                camera.fx * bx, camera.fy * by, zero,
                c2x, c2y, op)

    def prime(x, y, z):
        return (camera.fx * x + camera.cx * z,
                camera.fy * y + camera.cy * z, z)

    return (*prime(qcx, qcy, qcz), *prime(ax, ay, az), *prime(bx, by, bz),
            c2x, c2y, op)
