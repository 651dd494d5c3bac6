"""Banded segment-expand Pallas kernel: per-slot rows from per-gaussian rows.

The binning expansion needs each intersection slot to read its owner
gaussian's fields (slot-range offset, tile span, tile mins, original index).
As an XLA gather that costs ~20 ms at 1080p (scalar-core bound per row), and
the owner-of-slot map itself used to take a scatter-add + two 4M cumsums
(~8 ms). This kernel does both at once from the *offsets* array alone:

Gaussians are pre-sorted so that all with nonzero tile count come first (the
binning presort), hence ``offsets`` (exclusive prefix sum of tile counts) is
non-decreasing and gaussian w owns the slot range [offs_w, offs_{w+1}).
A chunk of R consecutive slots is then owned by a *band* of at most R+1
consecutive gaussians, so each grid step streams its window of per-gaussian
field rows sequentially from HBM and builds the ownership one-hot directly
from the offsets as an interval test per (gaussian row, slot lane):

    S[w, r] = [offs_w <= slot_r] & [offs_{w+1} > slot_r]
            = [gaussian base+w owns slot r]

(zero-count gaussians inside the window have offs_w == offs_{w+1} and drop
out natively), then expands with one matmul on the MXU:

    out[:, r] = sum_w S[w, r] * fields[:, base + w]

The interval test needs the offsets sublane-major; one small (1, W)
transpose per chunk provides it. DMAs are double-buffered: chunk c+1's copy
is issued before chunk c's compute, so the ~8192 per-chunk DMA latencies
overlap compute instead of serializing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_R = 512  # slots per grid step
_W = _R + 256  # gaussian-row window per chunk (band + 128-alignment slack)
_FPAD = 8  # field-major sublane count (fields padded up to this)

# Offset sentinel for padded rows: large, finite (0 * inf in the expand
# matmul would poison rows with NaN), exactly representable in f32.
_SENTINEL = 2.0**30


def _dma(c, fields_hbm, fbuf, sem, bases_ref):
    buf = c % 2
    base = pl.multiple_of((bases_ref[c] // 128) * 128, 128)
    return pltpu.make_async_copy(
        fields_hbm.at[:, pl.ds(base, _W)], fbuf.at[buf], sem.at[buf]
    )


def _kernel(bases_ref, fields_hbm, out_ref, fbuf, sem, *, F):
    c = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(c == 0)
    def _():
        _dma(0, fields_hbm, fbuf, sem, bases_ref).start()

    @pl.when(c + 1 < n)
    def _():
        _dma(c + 1, fields_hbm, fbuf, sem, bases_ref).start()

    _dma(c, fields_hbm, fbuf, sem, bases_ref).wait()
    buf = c % 2

    # Offsets as a (W, 1) sublane-major column for the interval test (the
    # DMA'd rows are lane-major). One small transpose per chunk.
    offs = jax.lax.transpose(fbuf[buf, 0:1, :], (1, 0))  # (W, 1)
    # offs_{w+1}, via a sublane roll of the column (cheap: 1 lane wide).
    # Row W-1 wraps junk; overwrite with the sentinel so it owns nothing
    # (the band guarantee keeps real owners below it anyway).
    nxt = pltpu.roll(offs, _W - 1, axis=0)
    row = jax.lax.broadcasted_iota(jnp.int32, (_W, 1), 0)
    nxt = jnp.where(row < _W - 1, nxt, _SENTINEL)

    slots = (
        jnp.float32(c * _R)
        + jax.lax.broadcasted_iota(jnp.int32, (1, _R), 1).astype(jnp.float32)
    )  # (1, R) exact small ints
    onehot = ((offs <= slots) & (nxt > slots)).astype(jnp.float32)  # (W, R)
    out_ref[...] = jax.lax.dot_general(
        fbuf[buf], onehot, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (_FPAD, R)


def segment_expand_offsets(fields_t, capacity, interpret=False):
    """Expand per-gaussian field rows to per-slot rows by offset ownership.

    Args:
        fields_t: (F, N) f32 field-major per-gaussian rows, F <= 8.
            Row 0 MUST be the exclusive prefix sum of per-gaussian slot
            counts (non-decreasing, exact integers in f32), with all
            zero-count gaussians sorted to the back.
        capacity: number of output slots (M). Slots >= offsets[-1]+count[-1]
            read as 0 rows.

    Returns (F, M_pad >= capacity) f32; slice [:, :capacity].
    """
    F, N = fields_t.shape
    if F > _FPAD:
        raise ValueError(f"at most {_FPAD} fields, got {F}")
    m_pad = -(-capacity // _R) * _R
    n_chunks = m_pad // _R

    offsets = fields_t[0]
    fields_p = jnp.pad(
        fields_t.astype(jnp.float32), ((0, _FPAD - F), (0, _W + 128))
    )
    # Sentinel tail on the offsets row: rows past N own no slot.
    fields_p = fields_p.at[0, N:].set(_SENTINEL)

    # Owner rank of each chunk's first slot: one small searchsorted
    # (n_chunks queries into N) replaces the old scatter + 4M cumsum.
    starts = jnp.arange(0, m_pad, _R, dtype=jnp.float32)
    bases = jnp.maximum(
        jnp.searchsorted(offsets, starts, side="right").astype(jnp.int32) - 1,
        0,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((_FPAD, _R), lambda c, b: (0, c)),
        scratch_shapes=[
            pltpu.VMEM((2, _FPAD, _W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, F=_FPAD),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((_FPAD, m_pad), jnp.float32),
        interpret=interpret,
    )(bases, fields_p)
    return out[:F]
