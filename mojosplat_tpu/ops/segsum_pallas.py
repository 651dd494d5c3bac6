"""Banded segment-sum Pallas kernel: reduce key-sorted rows at bandwidth.

The adjoint of the per-slot row gather is a segment reduction of ~4M
gradient rows into ~1M per-gaussian rows. Every XLA primitive for this is
scalar-core bound per row on TPU (measured at 4.18M rows x 10 lanes:
scatter-add 338 ms, segment_sum 336 ms, sorted segment_sum 265 ms,
permutation gather 95 ms) because each destination row is a random ~40 B
HBM access.

This kernel exploits sortedness instead: after ``jax.lax.sort`` by gaussian
id (~31 ms for key + 10 payload columns — sorts move rows in streaming merge
passes, not random access), consecutive rows belong to non-decreasing ids.
The grid walks windows of W ids; each step DMAs its rows *sequentially* from
HBM (field-major layout, 128-aligned chunk starts) and reduces them with a
one-hot matmul on the MXU:

    acc[j, :] += sum_r [key_r - w*W == j] * rows[:, r]

Rows pulled in by start-alignment or chunk overrun belong to other windows,
so the one-hot comparison drops them for free — no masking logic at all.
All HBM traffic is sequential, the reduction runs on the MXU, and the
accumulation order is fixed -> deterministic gradients (SURVEY.md section 5,
race-detection row), ~10x faster than the best XLA form.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Window of destination ids per grid step, rows per DMA chunk, and the
# field-major sublane count (fields padded up to this).
_W = 512
_R = 1024
_FPAD = 16


def _kernel(bounds_ref, cols_hbm, out_ref, buf, acc, sem, *, F, key_row,
            precision, fpad):
    w = pl.program_id(0)
    # Quantize the window's row range to 128-aligned chunk starts; the
    # extra rows straddling the boundary fail the key-window test below.
    start = pl.multiple_of((bounds_ref[w] // 128) * 128, 128)
    end = bounds_ref[w + 1]

    acc[...] = jnp.zeros_like(acc)
    base = (w * _W).astype(jnp.float32)

    def body(i, _):
        dma = pltpu.make_async_copy(
            cols_hbm.at[:, pl.ds(start + i * _R, _R)], buf, sem
        )
        dma.start()
        dma.wait()
        chunk = buf[...]  # (fpad, R) field-major
        rel = chunk[key_row : key_row + 1, :] - base  # (1, R) f32 exact ints
        j = jax.lax.broadcasted_iota(jnp.int32, (_W, _R), 0).astype(
            jnp.float32
        )
        onehot = (rel == j).astype(jnp.float32)  # (W, R)
        # Field-major (fpad, W) accumulation: the output stays channel-major
        # so its HBM layout is unpadded (an (N, F<128) output pads F lanes
        # to 128 — a ~0.5 GB allocation at 1M segments).
        acc[...] = acc[...] + jax.lax.dot_general(
            chunk, onehot, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # (fpad, W)
        return 0

    jax.lax.fori_loop(0, pl.cdiv(end - start, _R), body, 0)
    out_ref[...] = acc[:F, :]


def segment_sum_cols(cols, keys, num_segments, interpret=False,
                     exact=True):
    """Sum columns into (F, num_segments) by non-decreasing int keys.

    Args:
        cols: tuple of F arrays (M,) f32 — the payload, one array per field
            (e.g. straight from ``jax.lax.sort`` operands, no restacking).
        keys: (M,) int32 sorted ascending in [0, num_segments]; rows with
            key == num_segments (or beyond) are dropped (padding).
        num_segments: number of destinations.

    Returns (F, num_segments) f32 — field-major, so the result's HBM layout
    is unpadded (segments on lanes). Deterministic.
    """
    F = len(cols)
    M = keys.shape[0]
    # Sublane pad of the field-major DMA buffer: 16 covers the common 3DGS
    # payloads; wider payloads (the surfel aux kernels route 18 field rows)
    # bump to the next multiple of 8 and only they pay the extra bandwidth.
    fpad = max(_FPAD, -(-(F + 1) // 8) * 8)
    n_windows = -(-num_segments // _W)

    m_pad = -(-M // _R) * _R + _R
    key_row = F
    # One stack + one pad; zero-padded keys route zero payload rows to
    # segment 0, which adds nothing.
    stacked = jnp.stack(
        [c.astype(jnp.float32) for c in cols]
        + [keys.astype(jnp.float32)],
        axis=0,
    )  # (F + 1, M)
    stacked = jnp.pad(
        stacked, ((0, fpad - F - 1), (0, m_pad - M))
    )

    bounds = jnp.searchsorted(
        keys, jnp.arange(0, (n_windows + 1) * _W, _W, dtype=jnp.int32)
    ).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_windows,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((F, _W), lambda w, b: (0, w)),
        scratch_shapes=[
            pltpu.VMEM((fpad, _R), jnp.float32),  # DMA landing buffer
            pltpu.VMEM((fpad, _W), jnp.float32),  # accumulator
            pltpu.SemaphoreType.DMA,
        ],
    )
    precision = (
        jax.lax.Precision.HIGHEST if exact else jax.lax.Precision.DEFAULT
    )
    out = pl.pallas_call(
        functools.partial(_kernel, F=F, key_row=key_row,
                          precision=precision, fpad=fpad),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((F, n_windows * _W), jnp.float32),
        interpret=interpret,
    )(bounds, stacked)
    return out[:, :num_segments]


def segment_sum_rows(rows, keys, num_segments, interpret=False,
                     exact=True):
    """Deterministic segment-sum of unsorted (M, F) rows: sort by key
    (streaming merge passes, bandwidth-friendly), then the banded matmul
    reduction. Returns (num_segments, F)."""
    M, F = rows.shape
    ops = jax.lax.sort(
        (keys,) + tuple(rows[:, i] for i in range(F)), num_keys=1
    )
    return segment_sum_cols(
        ops[1:], ops[0], num_segments, interpret=interpret, exact=exact
    ).T
