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
consecutive gaussians, so each grid step DMAs its window of per-gaussian
field rows sequentially and builds the ownership one-hot directly from the
offsets row as an adjacent difference of less-or-equal comparisons:

    S[w, r] = [offs_w <= slot_r] - [offs_{w+1} <= slot_r]
            = [gaussian base+w owns slot r]

(zero-count gaussians inside the window have offs_w == offs_{w+1} and drop
out natively), then expands with one matmul on the MXU:

    out[:, r] = sum_w S[w, r] * fields[:, base + w]

All HBM traffic is sequential; no scatter, no 4M cumsum, no rank array.
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


def _kernel(bases_ref, fields_hbm, out_ref, fbuf, sem, *, F):
    c = pl.program_id(0)
    base = pl.multiple_of((bases_ref[c] // 128) * 128, 128)

    fdma = pltpu.make_async_copy(
        fields_hbm.at[:, pl.ds(base, _W)], fbuf, sem
    )
    fdma.start()
    fdma.wait()

    # Offsets of the window's gaussians, both lane-major (row 0 as DMA'd)
    # and sublane-major (for the (W, R) ownership comparison). The sublane
    # copy comes from a VMEM transpose of the single offsets row.
    offs_lanes = fbuf[0:1, :]  # (1, W)
    offs_col = jax.lax.transpose(offs_lanes, (1, 0))  # (W, 1)

    slots = (
        jnp.float32(c * _R)
        + jax.lax.broadcasted_iota(jnp.int32, (1, _R), 1).astype(jnp.float32)
    )  # (1, R) exact small ints
    le = (offs_col <= slots).astype(jnp.float32)  # (W, R)
    # S[w] = le[w] - le[w+1]; the last row wraps junk under the circular
    # roll, but the band guarantee (owners fit in W-1 rows) plus the mask
    # below keeps it out of the result.
    le_next = pltpu.roll(le, _W - 1, axis=0)  # row w holds le[w+1]
    row = jax.lax.broadcasted_iota(jnp.int32, (_W, _R), 0)
    onehot = jnp.where(row < _W - 1, le - le_next, 0.0)  # (W, R)
    out_ref[...] = jax.lax.dot_general(
        fbuf[...], onehot, (((1,), (0,)), ((), ())),
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
    # Sentinel on the padded tail of the offsets row only: rows past N must
    # own no slot, so their offset must exceed every slot index. Large
    # FINITE value (not inf): the ownership one-hot multiplies it by 0 in
    # the MXU expand, and 0 * inf would poison the row with NaN.
    fields_p = fields_p.at[0, N:].set(jnp.float32(2.0**30))

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
            pltpu.VMEM((_FPAD, _W), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, F=_FPAD),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((_FPAD, m_pad), jnp.float32),
        interpret=interpret,
    )(bases, fields_p)
    return out[:F]
