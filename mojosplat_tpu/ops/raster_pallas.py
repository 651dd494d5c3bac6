"""Pallas TPU rasterization kernels: tiled forward + hand-written backward.

This is the TPU-native equivalent of the reference's native rasterizer
(/root/reference/mojosplat/kernels/rasterization.mojo:16-162). The reference
maps one CUDA thread to one pixel and stages gaussians in shared memory
between barriers; here one *grid step* owns one 16x16 tile, the tile's pixel
block lives in vector registers (pixels on sublanes, gaussians on lanes), and
Pallas double-buffers each tile's gaussian table slice HBM->VMEM while the
previous tile computes.

Two things the pure-XLA path (rasterization.py) cannot do, this kernel does:

  1. **Per-tile dynamic work.** The XLA scan must run ``tile_capacity/chunk``
     blend steps for every tile; here each chunk is guarded by the tile's
     real intersection count (scalar-prefetched), so sparse tiles cost
     O(their gaussians), not O(capacity).
  2. **Chunk-level early termination.** The sequential break at transmittance
     <= 1e-4 (rasterization.mojo:147-149) becomes an ``alive`` predicate that
     skips all remaining chunks once every pixel in the tile is saturated.

The chunk loop is unrolled in Python (tile_capacity / pallas_chunk is a small
static count), so every lane slice is static — Mosaic cannot prove dynamic
lane offsets aligned — and the skip is a real branch (lax.cond), not masking.

The backward pass is a second kernel (the capability the reference lacks
entirely; its kernel drops the per-pixel transmittance needed for it,
rasterization.py:124). The forward saves each chunk's incoming per-pixel
transmittance (sign-packed with the early-termination latch); the backward
walks chunks in reverse carrying the transmittance cotangent, recomputing
each chunk's alpha cumprod (deterministic, so the applied mask reconstructs
bit-exactly), producing per-slot gradients that are routed back to
per-gaussian arrays deterministically (no atomics — SURVEY.md section 5,
race-detection row).

Both kernels share the blending math of the XLA path (_blend_chunk /
_pixel_alphas in rasterization.py), so the XLA path doubles as the oracle in
tests (interpret mode on CPU, element-wise comparisons on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Packed per-slot row layout (gaussians on lanes after the XLA transpose):
# rows 0..5 = x, y, conic_a, conic_b, conic_c, opacity; rows 6..9 = rgb + one
# zero pad column (so blend matmuls have an even N dim and the final T can
# share the output buffer's 4th column). ONE packed row-gather: XLA's TPU
# gather costs ~per-row scalar-core work, so 10 separate field gathers are
# ~10x the price of one 10-wide row gather (measured 45 ms -> ~1 ms at 400k
# intersections).
_PROWS = 10
_CCOLS = 4  # accumulated channels: rgb + one aux (depth or zero pad)
_OCOLS = _CCOLS + 1  # kernel output: accumulated channels + transmittance


def _roll_r(x, s):
    """Shift lanes right by s (toward higher index); wrapped lanes are junk
    and must be masked by the caller."""
    return pltpu.roll(x, s, axis=1)


def _roll_l(x, s, K):
    """Shift lanes left by s via a circular right-roll of K - s."""
    return pltpu.roll(x, K - s, axis=1)


def _lane_col(K):
    """(1, K) lane-index iota: every lane mask below varies only along
    lanes, so a single-sublane iota broadcasts into the selects instead of
    materializing (P, K) iota/compare chains."""
    return jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)


def _lane_cumprod(x, col, K):
    """Inclusive cumulative product along lanes (Hillis-Steele, log2 K steps).

    ``col`` is a lane-index iota broadcastable to x.shape ((1, K) or full).
    """
    s = 1
    while s < K:
        x = x * jnp.where(col >= s, _roll_r(x, s), 1.0)
        s *= 2
    return x


def _lane_excl(x_incl, col, one):
    """Exclusive variant from an inclusive lane scan: shift right 1, fill."""
    return jnp.where(col >= 1, _roll_r(x_incl, 1), one)


def _lane_rev_cumsum_excl(q, col, K):
    """S_j = sum_{i > j} q_i along lanes (exclusive reverse cumsum)."""
    x = jnp.where(col < K - 1, _roll_l(q, 1, K), 0.0)
    s = 1
    while s < K:
        x = x + jnp.where(col < K - s, _roll_l(x, s, K), 0.0)
        s *= 2
    return x


def _tile_pixel_centers(t, ts, tw, P):
    """Pixel centers of tile t at +0.5 (rasterization.mojo:78-79), pixels on
    sublanes: p = row * ts + col within the tile. Returns ((P,1), (P,1))."""
    pidx = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    tile_y = t // tw
    tile_x = t - tile_y * tw
    px = (tile_x * ts + pidx % ts).astype(jnp.float32) + 0.5
    py = (tile_y * ts + pidx // ts).astype(jnp.float32) + 0.5
    return px, py


def _dot3(a, b, dims):
    """f32 dot via a manual 3-pass bf16 split: ah@bh + ah@bl + al@bh.

    Relative error ~2^-17 (the dropped al@bl term and the split rounding)
    — measured 4.6e-6 max absolute on the headline blend at image scale
    0.8 — versus XLA HIGHEST's 6 passes at twice the MXU cost: the HIGHEST
    blend matmul was the single largest component of the forward kernel
    (9.5 of 25 ms, scripts/dev_kernel_probe.py); the 3-pass form returns
    ~3 ms. Mosaic exposes only DEFAULT (1-pass bf16) and HIGHEST (6-pass),
    so the middle precision is spelled out by hand.
    """
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=dims,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    ah = a.astype(jnp.bfloat16).astype(jnp.float32)
    al = a - ah
    bh = b.astype(jnp.bfloat16).astype(jnp.float32)
    bl = b - bh
    return dot(ah, bh) + dot(ah, bl) + dot(al, bh)


def _chunk_rows(pdata_ref, k, K):
    """Read chunk k's (_PROWS, K) field rows (gaussians on lanes).

    pdata is field-major (_PROWS, n_tiles*cap), blocked (_PROWS, cap) per
    tile: one XLA transpose after the gather, zero transposes anywhere in
    the backward chain (each 1080p transpose of this data is a 167 MB
    round-trip that buffer assignment then fails to reuse).
    """
    return pdata_ref[:, k * K : (k + 1) * K]


def _chunk_geometry(g, k, K, px, py, count, config):
    """Shared fwd/bwd per-chunk math up to the (P, K) alpha matrix.

    ``g`` is the (_PROWS, K) transposed chunk; ``k`` is a static Python int
    (unrolled loop). Matches _pixel_alphas (rasterization.py:103-114).

    Measured dead end (round 4, scripts/dev_fast_sigma.py): evaluating
    sigma as a tile-local quadratic-basis MXU dot ((P, 6) @ (6, K),
    HIGHEST) instead of this VPU chain changes the kernel time by < 1%
    (25.85 -> 26.08 ms fwd at headline scale) while costing ~1e-3 absolute
    image error from f32 cancellation - the kernel is not bound by the
    sigma arithmetic (scripts/dev_kernel_probe.py attributes the time).
    """
    xg = g[0:1, :]  # (1, K)
    yg = g[1:2, :]
    ca = g[2:3, :]
    cb = g[3:4, :]
    cc = g[4:5, :]
    op = g[5:6, :]

    dx = xg - px  # (P, K)
    dy = yg - py
    sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
    e = jnp.exp(-sigma)
    raw = op * e
    alpha = jnp.minimum(raw, config.max_alpha)
    col = _lane_col(K)  # (1, K); lane masks broadcast against (P, K)
    keep = (
        (sigma >= 0.0)
        & (alpha >= config.alpha_threshold)
        & (col + k * K < count)
    )
    alpha = jnp.where(keep, alpha, 0.0)
    return alpha, keep, raw, e, dx, dy, ca, cb, cc, op, col


def _fwd_kernel(counts_ref, pdata_ref, out_ref, thist_ref,
                t_s, done_s, acc_s, *, K, P, ts, tw, tps, config):
    # All loop state lives in VMEM scratch and chunk updates are predicated
    # (pl.when): branch carries of (P, 1) vectors blow up Mosaic's scf.if
    # into dozens of vreg yields per chunk and crash the compiler.
    # Each grid step owns `tps` tiles to amortize per-step pipeline overhead
    # (8160 single-tile steps at 1080p spend more time stepping than
    # computing).
    tt = pl.program_id(0)
    eps = config.transmittance_eps
    cap = pdata_ref.shape[1] // tps
    cp = pdata_ref.shape[0] - 6  # accumulated channels (>= _CCOLS)

    # Per-chunk incoming transmittance, sign-packed with the done latch
    # (T is always > 0): the residual the backward kernel replays instead of
    # re-walking the tile forward. Default -1 = "all pixels done" so the
    # backward skips chunks the forward never ran. The applied mask itself is
    # NOT saved: the backward recomputes the identical alpha cumprod (the
    # scan is deterministic), so (t_in, alphas) fully reconstruct it.
    thist_ref[...] = jnp.full_like(thist_ref, -1.0)

    for i in range(tps):
        t = tt * tps + i
        count = counts_ref[t]
        px, py = _tile_pixel_centers(t, ts, tw, P)

        t_s[...] = jnp.ones((P, 1), jnp.float32)
        done_s[...] = jnp.zeros((P, 1), jnp.float32)
        acc_s[...] = jnp.zeros((P, cp), jnp.float32)

        for k in range(cap // K):  # static unroll; static lane slices
            guard = (k * K < count) & (jnp.min(done_s[...]) == 0.0)

            @pl.when(guard)
            def _(k=k, i=i, count=count, px=px, py=py):
                t_in = t_s[...]
                done = done_s[...]
                # Chunk-major (nc, P) residual layout: P=256 on lanes keeps
                # the HBM tiling T(8,128) unpadded. The (P, nc) layout puts
                # nc (1-8) on lanes and pads every tile to 128 lanes — a
                # 16-32x HBM expansion (~1 GB per buffer at 1080p) that OOMed
                # the 2DGS maps config and bloated every step.
                thist_ref[i, k : k + 1, :] = jnp.where(
                    done == 0.0, t_in, -t_in
                ).T
                g = _chunk_rows(pdata_ref, i * (cap // K) + k, K)
                alpha, *_rest = _chunk_geometry(
                    g, k, K, px, py, count, config
                )
                col = _lane_col(K)
                cum = _lane_cumprod(1.0 - alpha, col, K)
                t_after = t_in * cum
                alive = done == 0.0
                applied = (t_after > eps) & alive
                eff = jnp.where(applied, alpha, 0.0)
                # `applied` is a lane prefix (t_after is non-increasing), so
                # on applied lanes the exclusive cumprod of the *effective*
                # alphas equals the exclusive cumprod of the original alphas
                # bit-exactly (a Hillis-Steele scan at position j depends
                # only on inputs 0..j, which agree). On non-applied lanes
                # eff == 0 zeroes w, so one cumprod serves both roles —
                # the second scan the old kernel ran was redundant.
                excl = _lane_excl(cum, col, 1.0)
                w = eff * t_in * excl  # (P, K)

                cols_t = g[6:, :]  # (cp, K) channels (+ zero pad rows)
                acc_s[...] = acc_s[...] + _dot3(
                    w, cols_t, (((1,), (1,)), ((), ()))
                )
                # T after the chunk = t_after at the last applied lane
                # (t_in when none applied) = the min over applied lanes,
                # since t_after <= t_in and is non-increasing.
                t_s[...] = jnp.min(
                    jnp.where(applied, t_after, t_in), axis=1, keepdims=True
                )
                done_s[...] = jnp.maximum(
                    done,
                    (t_after[:, K - 1 : K] <= eps).astype(jnp.float32),
                )

        # All _CCOLS accumulated channels (rgb + the 4th aux channel — depth
        # when the caller packs per-gaussian depths into pdata row 9, zeros
        # otherwise; the MXU blend matmul computes it either way), then T.
        # Channel-major (oc, P): one in-register transpose per tile buys an
        # unpadded HBM layout for the output and its cotangent.
        out_ref[i, :, :] = jnp.concatenate(
            [acc_s[...], t_s[...]], axis=1
        ).T


def _bwd_kernel(counts_ref, pdata_ref, gout_ref, thist_ref,
                dpdata_ref,
                gt_s, *, K, P, ts, tw, tps, config):
    # Gradient-only matmuls follow the grad_route_bf16 knob: users opting
    # into the fast approximate gradient route get single-pass MXU dots too.
    grad_precision = (
        jax.lax.Precision.DEFAULT
        if config.grad_route_bf16
        else jax.lax.Precision.HIGHEST
    )
    # Loop state in VMEM scratch + pl.when, same rationale as _fwd_kernel.
    # The forward saved each chunk's incoming transmittance sign-packed with
    # the done latch, so there is no forward re-walk here: one reverse pass.
    tt = pl.program_id(0)
    eps = config.transmittance_eps
    cap = pdata_ref.shape[1] // tps
    cp = pdata_ref.shape[0] - 6  # accumulated channels (>= _CCOLS)
    nchunks_max = cap // K

    dpdata_ref[...] = jnp.zeros_like(dpdata_ref)

    # Tile-local quadratic pixel basis [1, u, v, u^2, uv, v^2] with
    # u, v in [0.5, ts - 0.5] — identical for every tile, built once. The
    # geometry gradients are recovered from d_sigma's moments against this
    # basis with ONE small MXU matmul per chunk instead of five per-pixel
    # product chains + six cross-sublane tree reductions (each reduce is
    # ~P/8 vector adds — they dominated the backward's VPU time).
    pidx = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    u = (pidx % ts).astype(jnp.float32) + 0.5
    w_ = (pidx // ts).astype(jnp.float32) + 0.5
    ones_p = jnp.ones((P, 1), jnp.float32)
    basis = jnp.concatenate(
        [ones_p, u, w_, u * u, u * w_, w_ * w_], axis=1
    )  # (P, 6)
    # Strict upper-triangular ones: S = q @ rev_tri computes the exclusive
    # reverse lane cumsum as ONE MXU dot in the fast-gradient mode,
    # replacing the 7-step Hillis-Steele scan (~21 VPU ops over (P, K) per
    # chunk — the single largest VPU chain in this kernel). bf16
    # truncation of q matches the route's existing quantization; the exact
    # mode keeps the VPU scan.
    rev_tri = (
        jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
        > jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    ).astype(jnp.float32)

    for i in range(tps):
        t = tt * tps + i
        count = counts_ref[t]
        px, py = _tile_pixel_centers(t, ts, tw, P)
        tile_y = t // tw
        ox = ((t - tile_y * tw) * ts).astype(jnp.float32)
        oy = (tile_y * ts).astype(jnp.float32)

        # ---- Reverse chunk walk carrying the transmittance cotangent.
        # Channel-major (_OCOLS, P): rows 0..2 dL/drgb, 3 dL/daux (zero
        # unless the caller rendered the aux/depth channel), 4 dL/dT_final.
        gout = gout_ref[i, :, :]
        v = gout[:cp, :]  # (cp, P) accumulated-channel cotangents
        gt_s[...] = gout[cp : cp + 1, :].T

        for k in reversed(range(nchunks_max)):
            th = thist_ref[i, k : k + 1, :].T  # (P, 1) signed T_in

            @pl.when((k * K < count) & (jnp.max(th) > 0.0))
            def _(k=k, i=i, th=th, v=v, count=count, px=px, py=py,
                  ox=ox, oy=oy):
                t_in = jnp.abs(th)
                gt = gt_s[...]
                g = _chunk_rows(pdata_ref, i * nchunks_max + k, K)
                alpha, keep, raw, e, dx, dy, ca, cb, cc, op, col = (
                    _chunk_geometry(g, k, K, px, py, count, config)
                )
                # Recompute the forward's applied mask bit-exactly: the same
                # deterministic alpha cumprod against the saved t_in and the
                # sign-packed alive latch. As in the forward, one cumprod of
                # the *original* alphas serves as the exclusive prefix for
                # all applied lanes (prefix property), and the chunk-exit
                # transmittance is the min over applied lanes.
                cum = _lane_cumprod(1.0 - alpha, col, K)
                t_after = t_in * cum
                applied = (t_after > eps) & (th > 0.0)
                eff = jnp.where(applied, alpha, 0.0)
                ome = 1.0 - eff
                excl = _lane_excl(cum, col, 1.0)
                t_before = t_in * excl  # (P, K)
                w = eff * t_before
                cum_last = jnp.min(
                    jnp.where(applied, cum, 1.0), axis=1, keepdims=True
                )
                t_out = t_in * cum_last

                cols_t = g[6:, :]  # (cp, K) channels (+ zero pad rows)
                # cv[p, j] = sum_c v[c, p] * cols_t[c, j]
                cv = jax.lax.dot_general(
                    v, cols_t, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=grad_precision,
                )  # (P, K)

                # d cols_t[c, j] = sum_p v[c, p] * w[p, j]
                d_cols_t = jax.lax.dot_general(
                    v, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=grad_precision,
                )  # (cp, K)

                q = w * cv  # (P, K)
                if config.grad_route_bf16:
                    # S[p, j] = sum_{i > j} q[p, i] on the MXU.
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
                    keep & (raw < config.max_alpha), d_alpha, 0.0
                )

                d_op = d_raw * e
                d_sigma = -d_raw * raw

                # Geometry gradients via d_sigma's pixel moments: with
                # tile-local u = px - ox (so dx = X - u, X = xg - ox),
                #   sum_p dx^2 d  = X^2 m0 - 2 X mu + muu   etc.
                # One (6, P) x (P, K) MXU dot replaces the five per-pixel
                # chains and their sublane tree reductions; d_op keeps its
                # own 1-row dot (a different per-pixel weight).
                m = jax.lax.dot_general(
                    basis, d_sigma, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=grad_precision,
                )  # (6, K)
                m0, mu, mv = m[0:1, :], m[1:2, :], m[2:3, :]
                muu, muv, mvv = m[3:4, :], m[4:5, :], m[5:6, :]
                sum_dop = jax.lax.dot_general(
                    ones_p, d_op, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=grad_precision,
                )  # (1, K)
                xr = g[0:1, :] - ox  # X: gaussian x in tile-local coords
                yr = g[1:2, :] - oy
                s_dx = xr * m0 - mu  # sum_p dx d_sigma
                s_dy = yr * m0 - mv
                s_dx2 = xr * xr * m0 - 2.0 * xr * mu + muu
                s_dy2 = yr * yr * m0 - 2.0 * yr * mv + mvv
                s_dxdy = xr * yr * m0 - xr * mv - yr * mu + muv

                # Assemble the (10, K) gradient block, write its slice.
                d_g = jnp.concatenate(
                    [
                        ca * s_dx + cb * s_dy,  # d xg (sum_p d_dx)
                        cc * s_dy + cb * s_dx,  # d yg
                        0.5 * s_dx2,  # d conic_a
                        s_dxdy,  # d conic_b
                        0.5 * s_dy2,  # d conic_c
                        sum_dop,  # d opacity
                        d_cols_t,
                    ],
                    axis=0,
                )  # (6 + cp, K)
                sl0 = (i * nchunks_max + k) * K
                dpdata_ref[:, sl0 : sl0 + K] = d_g

                # dL/dT_in = sum_j eff_j excl_j cv_j + gT * prod(1 - eff).
                gt_s[...] = (
                    jnp.sum(eff * excl * cv, axis=1, keepdims=True)
                    + gt * cum_last
                )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def raster_tiles_pallas(pdata, counts, ts, tw, config):
    """Blend each tile's gathered gaussians front-to-back.

    Args:
        pdata: (10, n_tiles*cap) f32 field-major packed rows [x, y, conic_a,
            conic_b, conic_c, opacity, r, g, b, 0]; slots past each tile's
            count are never read (count guard), so their content is free.
        counts: (n_tiles,) int32 real intersections per tile (<= cap).
        ts: tile size (static).
        tw: tile-grid width (static), for pixel-coordinate reconstruction.
        config: RenderConfig (static).

    Returns:
        (n_tiles, 5, ts*ts) f32, channel-major: rows 0..2 premultiplied RGB,
        row 3 the accumulated aux channel (depth when pdata row 9 carries
        per-gaussian depths, zeros otherwise), row 4 the final per-pixel
        transmittance (the value the reference discards,
        rasterization.py:124). Channel-major so the pixel axis (ts*ts = 256)
        sits on lanes: the TPU T(8,128) tiled layout is unpadded, where the
        pixel-major (P, 5) form pads 5 lanes to 128 (a ~1 GB allocation per
        buffer at 1080p).
    """
    return _raster_fwd_call(pdata, counts, ts, tw, config)[0]


def _pad_tiles(pdata, counts, cap, tps):
    """Pad the tile axis to a multiple of tiles-per-step (count 0 tiles are
    skipped by the chunk guard, so pad content is never read)."""
    n_tiles = counts.shape[0]
    n_pad = -(-n_tiles // tps) * tps
    if n_pad != n_tiles:
        counts = jnp.pad(counts, (0, n_pad - n_tiles))
        pdata = jnp.pad(pdata, ((0, 0), (0, (n_pad - n_tiles) * cap)))
    return pdata, counts, n_pad


def _raster_fwd_call(pdata, counts, ts, tw, config):
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
    oc = rows - 6 + 1  # accumulated channels + transmittance

    kernel = functools.partial(
        _fwd_kernel, K=K, P=P, ts=ts, tw=tw, tps=tps, config=config
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
            pltpu.VMEM((P, 1), jnp.float32),  # t_s
            pltpu.VMEM((P, 1), jnp.float32),  # done_s
            pltpu.VMEM((P, rows - 6), jnp.float32),  # acc_s
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


def _raster_fwd_rule(pdata, counts, ts, tw, config):
    out, thist = _raster_fwd_call(pdata, counts, ts, tw, config)
    return out, (pdata, counts, thist)


def _raster_bwd_rule(ts, tw, config, residuals, gout):
    pdata, counts, thist = residuals
    n_tiles = counts.shape[0]
    cap = pdata.shape[1] // n_tiles
    P = ts * ts
    K = config.pallas_chunk
    tps = config.pallas_tiles_per_step
    pdata, counts, n_pad = _pad_tiles(pdata, counts, cap, tps)
    nc = cap // K
    rows = pdata.shape[0]
    oc = rows - 6 + 1
    if n_pad != n_tiles:
        gout = jnp.pad(gout, ((0, n_pad - n_tiles), (0, 0), (0, 0)))
    # thist comes from the forward already padded to n_pad.

    kernel = functools.partial(
        _bwd_kernel, K=K, P=P, ts=ts, tw=tw, tps=tps, config=config
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
            pltpu.VMEM((P, 1), jnp.float32),  # gt_s
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


raster_tiles_pallas.defvjp(_raster_fwd_rule, _raster_bwd_rule)


def _gather_rows_impl(packed_t, safe):
    packed_b, safe_b = jax.lax.optimization_barrier((packed_t, safe))
    rows = jax.lax.optimization_barrier(packed_b.T[safe_b])  # (M, rows)
    return rows.T  # (rows, M) field-major for the kernels


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _gather_rows(packed_t, safe, interpret=False, route_bf16=False,
                 nfields=_PROWS - 1):
    """Field-major packed_t.T[safe].T with a hand-built adjoint.

    ``packed_t`` arrives FIELD-MAJOR (rows, N): every tensor at this
    custom_vjp boundary (the primal, its cotangent, and the segment-sum
    output) keeps N on lanes, so the T(8,128) HBM layouts are unpadded. The
    (N, rows) form would pin `rows` (10-18) on lanes and pad to 128 — a
    ~0.5 GB allocation per buffer at N=1M, and the gradient graph
    materializes several. The transpose feeding the row gather is a layout
    bitcast, not a copy.

    Forward: optimization barriers keep XLA from fusing the gather with
    neighbors (the fused emission walks rows ~5x slower than the standalone
    dynamic-gather kernel, 14 vs 2.7 ns/row), then one transpose to the
    field-major layout every kernel consumes.

    Backward: the mathematically-implied scatter-add costs ~80 ns/row on TPU
    (327 ms/frame at 1080p — every XLA scatter/segment primitive is
    scalar-core bound); instead the cotangent arrives field-major, its rows
    feed jax.lax.sort directly (contiguous operands, zero transposes), and a
    banded matmul segment reduction (segsum_pallas.py) produces per-gaussian
    grads ~10x faster, still deterministically. Keeping the whole chain
    transpose-free also keeps peak HBM down: at 1080p each stray transpose
    is a 167 MB temporary that XLA buffer assignment fails to reuse.
    """
    return _gather_rows_impl(packed_t, safe)


def _gather_rows_fwd(packed_t, safe, interpret, route_bf16, nfields):
    return _gather_rows_impl(packed_t, safe), (safe, packed_t.shape[1])


def _pack_bf16_pair(a, b):
    """Two (M,) bf16 arrays -> one (M,) int32 (a in low 16 bits, b in high).

    Sort payload cost grows per *operand* (each payload column is carried
    through every merge pass), so pair-packing halves the operand count of
    the gradient-routing sort; the packing/unpacking itself is a cheap fused
    elementwise pass. int32 (not f32) so no NaN canonicalization risk.
    """
    au = jax.lax.bitcast_convert_type(a, jnp.uint16).astype(jnp.uint32)
    bu = jax.lax.bitcast_convert_type(b, jnp.uint16).astype(jnp.uint32)
    return jax.lax.bitcast_convert_type(au | (bu << 16), jnp.int32)


def _unpack_bf16_pair(p):
    """Inverse of _pack_bf16_pair: (M,) int32 -> two (M,) bf16."""
    u = jax.lax.bitcast_convert_type(p, jnp.uint32)
    lo = jax.lax.bitcast_convert_type(
        (u & 0xFFFF).astype(jnp.uint16), jnp.bfloat16
    )
    hi = jax.lax.bitcast_convert_type(
        (u >> 16).astype(jnp.uint16), jnp.bfloat16
    )
    return lo, hi


def _route_slot_grads(g, safe, N, F, n_extra, extra_cols, interpret,
                      route_bf16):
    """Sort + banded-MXU segment reduction of per-slot cotangents.

    Routes the first F rows of the (rows, M) per-slot cotangent ``g`` (plus
    ``n_extra`` caller-supplied extra per-slot columns, e.g. |grad| for
    absgrad) back to per-gaussian sums via ONE shared payload sort. Returns
    (F + n_extra, N) field-major summed rows (unpadded layout — see
    _gather_rows).
    """
    from .segsum_pallas import segment_sum_cols

    K = F + n_extra
    if route_bf16:
        # bf16 route: halves the payload bytes (~0.4% relative quantization
        # on the per-slot terms; the reduction still accumulates f32 on the
        # MXU) AND pair-packs the bf16 columns into int32 so the sort
        # carries half the payload operands.
        cols = [g[i].astype(jnp.bfloat16) for i in range(F)]
        cols += [c.astype(jnp.bfloat16) for c in extra_cols]
        if K % 2:
            cols.append(jnp.zeros_like(cols[0]))
        packed_cols = tuple(
            _pack_bf16_pair(cols[i], cols[i + 1])
            for i in range(0, len(cols), 2)
        )
        # is_stable=False: ~25% cheaper at 4M rows and still DETERMINISTIC
        # (a fixed comparison network; only the stability guarantee is
        # dropped, which the segment sum does not need — any fixed
        # within-segment order gives bitwise-reproducible f32 sums).
        ops = jax.lax.sort((safe,) + packed_cols, num_keys=1,
                           is_stable=False)
        unpacked = []
        for c in ops[1:]:
            lo, hi = _unpack_bf16_pair(c)
            unpacked += [lo, hi]
        return segment_sum_cols(
            tuple(unpacked[:K]), ops[0], N, interpret=interpret, exact=False
        )
    ops = jax.lax.sort(
        (safe,) + tuple(g[i] for i in range(F)) + tuple(extra_cols),
        num_keys=1,
        is_stable=False,
    )
    return segment_sum_cols(
        ops[1:], ops[0], N, interpret=interpret, exact=True
    )


def _gather_rows_bwd(interpret, route_bf16, nfields, res, g):
    safe, N = res
    # Rows >= nfields are zero pad columns: their cotangents are identically
    # zero and their destination slices in `packed` are discarded by the
    # pack's autodiff, so don't pay sort/reduce bandwidth for them. With a
    # real aux/depth channel nfields is _PROWS and every row is routed.
    F = nfields
    d9 = _route_slot_grads(g, safe, N, F, 0, (), interpret, route_bf16)
    # Pad back to the packed row count (g carries it; 10 for the 3DGS
    # kernels, 16/18 for the surfel kernels which reuse this gather).
    d_packed = jnp.pad(d9, ((0, g.shape[0] - F), (0, 0)))
    d_safe = np.zeros(safe.shape, dtype=jax.dtypes.float0)
    return d_packed, d_safe


_gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _gather_rows_abs(packed, safe, abs_sink, interpret=False,
                     route_bf16=False, nfields=_PROWS - 1):
    """_gather_rows plus absgrad: the cotangent of ``abs_sink`` (an all-zero
    (N, 2) input that does not affect the forward) is the per-gaussian sum of
    ABSOLUTE per-slot means2d gradients, sum over tiles of
    |d L / d means2d restricted to that tile|.

    This is the densification statistic of AbsGS / gsplat's absgrad option
    (the reference's oracle exposes it; the reference itself has no backward
    at all): accumulating |grad| per tile instead of letting opposite-sided
    pixel contributions cancel in the signed sum recovers large
    under-reconstructed gaussians whose net gradient is ~0. Granularity note:
    gsplat folds per-pixel |grad| within each tile; here the in-tile
    reduction is signed (it happens on the MXU inside the backward kernel)
    and the absolute value is taken per (gaussian, tile) slot — cancellation
    within one 16x16 tile is possible, across tiles it is not. Costs two
    extra payload columns on the existing gradient-routing sort; no kernel
    changes.
    """
    return _gather_rows_impl(packed, safe)


def _gather_rows_abs_fwd(packed_t, safe, abs_sink, interpret, route_bf16,
                         nfields):
    return _gather_rows_impl(packed_t, safe), (safe, packed_t.shape[1])


def _gather_rows_abs_bwd(interpret, route_bf16, nfields, res, g):
    safe, N = res
    F = nfields
    extra = (jnp.abs(g[0]), jnp.abs(g[1]))  # |d/dx|, |d/dy| per slot
    d_all = _route_slot_grads(g, safe, N, F, 2, extra, interpret, route_bf16)
    d_packed = jnp.pad(d_all[:F], ((0, g.shape[0] - F), (0, 0)))
    d_abs = d_all[F : F + 2].T.astype(jnp.float32)
    d_safe = np.zeros(safe.shape, dtype=jax.dtypes.float0)
    return d_packed, d_safe, d_abs


_gather_rows_abs.defvjp(_gather_rows_abs_fwd, _gather_rows_abs_bwd)


def gather_tile_data(means2d, conics, colors, opacities, slot_gids,
                     interpret=False, route_bf16=False, absgrad_sink=None):
    """Pack per-gaussian field columns into (10, N), gather by table.

    ONE packed row-gather instead of ten field gathers: XLA's TPU gather is
    scalar-core bound per *row*, so width is nearly free while row count is
    not (measured ~45 ms -> ~1 ms at 400k intersections). The VJP of
    _gather_rows is the deterministic scatter-add that routes per-slot
    gradients back to per-gaussian arrays (no atomics).

    Returns pdata (10, n_tiles*cap) f32, field-major.
    """
    N = means2d.shape[0]
    C = colors.shape[-1]
    # Channel count is free up to the default 4 (the kernels blend whatever
    # rows follow the 6 geometry fields); wider feature maps (gsplat's N-D
    # channels, e.g. semantic/feature splatting) just pack more rows — the
    # MXU blend matmul widens with them.
    cp = max(_PROWS - 6, C)
    # Field-major (rows, N) stack of 1D columns: every per-gaussian
    # intermediate (and the stack's split adjoints) stays (N,)-shaped or
    # N-on-lanes — unpadded HBM layouts (see _gather_rows).
    cols = [
        means2d[:, 0], means2d[:, 1],
        conics[:, 0], conics[:, 1], conics[:, 2],
        opacities,
    ] + [colors[:, c] for c in range(C)]
    cols = [c.astype(jnp.float32) for c in cols]
    cols += [jnp.zeros((N,), jnp.float32)] * (cp - C)
    packed = jnp.stack(cols, axis=0)  # (6 + cp, N)
    safe = jnp.clip(slot_gids.reshape(-1), 0, N - 1)
    # No validity masking: invalid (-1 padding) slots only exist past each
    # tile's count, and the kernels' count guard never reads them.
    # nfields: route gradients only for the real field rows (pad rows have
    # identically-zero cotangents).
    if absgrad_sink is not None:
        # absgrad_sink: zero (N, 2) whose cotangent is the absolute
        # view-space gradient statistic (see _gather_rows_abs).
        return _gather_rows_abs(
            packed, safe, absgrad_sink, interpret, route_bf16, 6 + C
        )
    return _gather_rows(
        packed, safe, interpret, route_bf16, 6 + C
    )  # (10, n_tiles*cap)
