"""Tile binning: gaussian -> (tile, depth)-sorted intersection lists (pure XLA).

Replaces both reference backends with a single fully-vectorized XLA program:
  - the gsplat CUDA path (isect_tiles radix sort + isect_offset_encode,
    /root/reference/mojosplat/binning.py:41-102), and
  - the torch path's Python double loop over gaussians x tiles
    (binning.py:170-209) and two-pass stable argsort (binning.py:217-231).

TPU-native design (SURVEY.md section 7): all shapes are *static* so changing
scenes never recompiles — unlike the reference, which JIT-specializes its
rasterizer on the intersection count every frame (rasterization.py:177,
README.md:27). Three static budgets bound the dynamic quantities:

  1. ``max_tile_span`` caps the per-gaussian tile footprint per axis; larger
     footprints are truncated symmetrically around the gaussian's center tile.
  2. ``capacity`` caps the total intersection count; surplus entries are
     dropped by the scatter's OOB-drop mode.
  3. Padding entries carry the sentinel ``tile_id == n_tiles`` which sorts past
     every real tile, so downstream range lookups need no masking.

Both truncation and capacity overflow are *counted and surfaced* in the aux
output instead of silently printed and dropped (binning.py:202-206).

The sort is a single stable ``jax.lax.sort`` keyed lexicographically on
(tile_id, depth) — the vectorized equivalent of the torch backend's
sort-by-depth-then-stable-sort-by-tile (binning.py:223-229). Tile ranges come
from one vectorized ``searchsorted`` (binning.py:252-256).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import DEFAULT_CONFIG, RenderConfig


class BinningAux(NamedTuple):
    """Observability counters (all traced scalars, int32)."""

    num_isects: jax.Array  # real intersections kept (<= capacity)
    capacity_overflow: jax.Array  # intersections dropped because buffer filled
    span_truncated: jax.Array  # tile slots lost to per-gaussian span capping


class BinningResult(NamedTuple):
    """Sorted intersection lists plus per-tile ranges.

    gaussian_ids: (capacity,) int32 gaussian index per intersection, sorted by
        (tile, depth); padding entries are -1.
    tile_ids: (capacity,) int32 flat tile id per entry; padding = n_tiles.
    tile_ranges: (tiles_h, tiles_w, 2) int32 [start, end) into the sorted lists
        (same layout as the reference's tile_ranges, binning.py:258-260).
    aux: BinningAux counters.
    """

    gaussian_ids: jax.Array
    tile_ids: jax.Array
    tile_ranges: jax.Array
    aux: BinningAux


def isect_capacity(n_gaussians: int, config: RenderConfig) -> int:
    """Static intersection-buffer capacity for N gaussians."""
    cap = config.isect_padding_multiplier * max(int(n_gaussians), 1)
    return int(-(-cap // 1024) * 1024)


def num_tiles(img_height: int, img_width: int, tile_size: int) -> tuple[int, int]:
    """Tile grid dims, ceil(H/ts) x ceil(W/ts) (binning.py:26-27)."""
    return math.ceil(img_height / tile_size), math.ceil(img_width / tile_size)


def bin_gaussians_to_tiles(
    means2d: jax.Array,  # (N, 2) pixel-space centers
    radii: jax.Array,  # (N, 2) int32 conservative radii (0 => culled)
    depths: jax.Array,  # (N,) camera-space z
    img_height: int,
    img_width: int,
    config: RenderConfig = DEFAULT_CONFIG,
    capacity: int | None = None,
) -> BinningResult:
    """Bin gaussians into screen tiles, depth-sorted within each tile.

    Same role as bin_gaussians_to_tiles (binning.py:8-37) without the backend
    dispatch.
    """
    N = means2d.shape[0]
    ts = config.tile_size
    span = config.max_tile_span
    th, tw = num_tiles(img_height, img_width, ts)
    n_tiles = th * tw
    if capacity is None:
        capacity = isect_capacity(N, config)

    # Binning output is pure structure (which gaussian lands in which tile,
    # in what order); its gradients are zero by design, matching the
    # reference where binning is index bookkeeping. Stopping here also keeps
    # autodiff away from the non-differentiable expand kernel below.
    means2d, depths = jax.lax.stop_gradient((means2d, depths))

    x, y = means2d[:, 0], means2d[:, 1]
    rx = radii[:, 0].astype(means2d.dtype)
    ry = radii[:, 1].astype(means2d.dtype)
    valid = (radii[:, 0] > 0) & (radii[:, 1] > 0)

    # Tile-space AABB, [min, max) exclusive, clamped to the grid (gsplat
    # isect_tiles convention; the torch backend clamps in pixel space first,
    # binning.py:146-155, which is equivalent at the tile granularity).
    tx_min = jnp.clip(jnp.floor((x - rx) / ts), 0, tw).astype(jnp.int32)
    tx_max = jnp.clip(jnp.ceil((x + rx) / ts), 0, tw).astype(jnp.int32)
    ty_min = jnp.clip(jnp.floor((y - ry) / ts), 0, th).astype(jnp.int32)
    ty_max = jnp.clip(jnp.ceil((y + ry) / ts), 0, th).astype(jnp.int32)

    span_x = jnp.where(valid, tx_max - tx_min, 0)
    span_y = jnp.where(valid, ty_max - ty_min, 0)
    orig_area = span_x * span_y

    # Symmetric truncation to the static per-axis span budget.
    excess_x = jnp.maximum(span_x - span, 0)
    excess_y = jnp.maximum(span_y - span, 0)
    tx_min = tx_min + excess_x // 2
    ty_min = ty_min + excess_y // 2
    span_x = jnp.minimum(span_x, span)
    span_y = jnp.minimum(span_y, span)
    counts = span_x * span_y
    span_truncated = jnp.sum(orig_area - counts)

    offsets = jnp.cumsum(counts) - counts  # exclusive prefix sum
    total = jnp.where(N > 0, offsets[-1] + counts[-1], 0).astype(jnp.int32)

    # Segmented expansion by prefix sums — the TPU-native replacement for the
    # reference's per-gaussian emission loop (binning.py:170-209). Each
    # gaussian owns the slot range [offsets[i], offsets[i]+counts[i]); instead
    # of scattering every candidate (tile, gaussian) pair (cost ~ N*span^2
    # scatter updates — measured 15-90x slower than the real intersection
    # count), we scatter-add ONE segment head per gaussian (N updates) and
    # recover the owner of every slot with a cumulative sum:
    #   head[offsets[i]] += 1  =>  gid[j] = cumsum(head)[j] - 1
    # Zero-count gaussians share their offset with the next gaussian; the adds
    # accumulate there and the cumsum resolves each slot to the LAST gaussian
    # starting at-or-before it, which is the unique non-empty owner. The local
    # tile of slot j then comes from a few (capacity,)-sized gathers. Total
    # cost is O(N + capacity), independent of max_tile_span.
    head = jnp.zeros((capacity,), jnp.int32)
    head = head.at[offsets].add(1, mode="drop")
    gid_buf = jnp.cumsum(head) - 1  # (capacity,) owner gaussian per slot

    slot = jnp.arange(capacity, dtype=jnp.int32)
    in_range = (slot < total) & (gid_buf >= 0)
    safe_gid = jnp.clip(gid_buf, 0, N - 1)
    if config.raster_impl == "pallas":
        # Banded-expand route (expand_pallas.py): index owners by their
        # *compact rank* (rank among nonzero-count gaussians), which steps
        # by at most 1 per slot, so a Pallas kernel can stream each chunk's
        # window of compacted rows sequentially and expand with a one-hot
        # matmul — ~6x faster than the per-row XLA gather.
        from .expand_pallas import segment_expand

        fields_cols = jax.lax.sort(
            (
                (counts == 0).astype(jnp.int32),  # nonzero-count first
                offsets.astype(jnp.float32),
                span_x.astype(jnp.float32),
                tx_min.astype(jnp.float32),
                ty_min.astype(jnp.float32),
                depths.astype(jnp.float32),
            ),
            num_keys=1,
            is_stable=True,
        )[1:]
        fields_t = jnp.stack(fields_cols, axis=0)  # (5, N) compacted-first
        crank = jnp.cumsum(jnp.minimum(head, 1)) - 1  # owner compact rank
        crank = jnp.clip(crank, 0, N - 1)
        g = segment_expand(
            fields_t, crank, interpret=config.pallas_interpret
        )[:, :capacity]
        g_off = g[0].astype(jnp.int32)
        g_sx = g[1].astype(jnp.int32)
        g_tx = g[2].astype(jnp.int32)
        g_ty = g[3].astype(jnp.int32)
        g_depth = g[4]
    else:
        # ONE packed row-gather of the per-gaussian fields (XLA's TPU gather
        # is scalar-core bound per row: five 1D gathers cost ~5x one 5-wide
        # row gather). Integer fields round-trip exactly through f32 (tile
        # grids and offsets are far below 2^24).
        fields = jnp.stack(
            [
                offsets.astype(jnp.float32),
                span_x.astype(jnp.float32),
                tx_min.astype(jnp.float32),
                ty_min.astype(jnp.float32),
                depths.astype(jnp.float32),
            ],
            axis=-1,
        )  # (N, 5)
        g = fields[safe_gid]  # (capacity, 5)
        g_off = g[:, 0].astype(jnp.int32)
        g_sx = g[:, 1].astype(jnp.int32)
        g_tx = g[:, 2].astype(jnp.int32)
        g_ty = g[:, 3].astype(jnp.int32)
        g_depth = g[:, 4]

    k = slot - g_off
    sx = jnp.maximum(g_sx, 1)
    ky = k // sx
    kx = k - ky * sx
    tile_buf = jnp.where(
        in_range, (g_ty + ky) * tw + (g_tx + kx), n_tiles
    )
    gid_buf = jnp.where(in_range, safe_gid, -1)
    depth_buf = jnp.where(in_range, g_depth, jnp.inf)

    # One stable lexicographic sort on (tile, depth) — the torch backend's
    # two-pass argsort (binning.py:223-229) collapsed into a single fused sort.
    sorted_tile, _, sorted_gid = jax.lax.sort(
        (tile_buf, depth_buf, gid_buf), num_keys=2, is_stable=True
    )

    # Per-tile [start, end) ranges via one searchsorted (binning.py:252-256).
    boundaries = jnp.searchsorted(
        sorted_tile, jnp.arange(n_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    tile_ranges = jnp.stack([boundaries[:-1], boundaries[1:]], axis=-1)
    tile_ranges = tile_ranges.reshape(th, tw, 2)

    num_isects = boundaries[-1]
    aux = BinningAux(
        num_isects=num_isects,
        capacity_overflow=jnp.maximum(total - capacity, 0).astype(jnp.int32),
        span_truncated=span_truncated.astype(jnp.int32),
    )
    return BinningResult(
        gaussian_ids=sorted_gid,
        tile_ids=sorted_tile,
        tile_ranges=tile_ranges,
        aux=aux,
    )
