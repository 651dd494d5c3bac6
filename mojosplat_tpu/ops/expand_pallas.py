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

Each grid step owns _S consecutive chunks sharing one double-buffered DMA
window (per-step overhead and DMA latency amortize _S-fold while the
per-slot one-hot stays _W wide); sub-chunk windows are lane slices at
128-aligned offsets within the superwindow. The interval test needs the
offsets sublane-major; one small (1, W) transpose per chunk provides it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_R = 512  # slots per chunk (one one-hot + expand matmul)
_W = _R + 256  # gaussian-row window per chunk (band + 128-alignment slack)
_S = 4  # chunks per grid step (shared DMA superwindow)
_WS = _S * _R + 256  # superwindow rows; sub-chunk j starts <= j*_R within it
_FPAD = 8  # field-major sublane count (fields padded up to this)

# Offset sentinel for padded rows: large, finite (0 * inf in the expand
# matmul would poison rows with NaN), exactly representable in f32 and bf16
# (a power of two, so the hi limb carries it alone).
_SENTINEL = 2.0**30


def _floor128(x):
    return pl.multiple_of((x // 128) * 128, 128)


def _dma(s, fields_hbm, fbuf, sem, bases_ref):
    buf = s % 2
    base = _floor128(bases_ref[s * _S])
    return pltpu.make_async_copy(
        fields_hbm.at[:, pl.ds(base, _WS)], fbuf.at[buf], sem.at[buf]
    )


def _kernel(bases_ref, fields_hbm, out_ref, fbuf, hi_ref, mid_ref, lo_ref,
            sem, *, F):
    s = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(s == 0)
    def _():
        _dma(0, fields_hbm, fbuf, sem, bases_ref).start()

    @pl.when(s + 1 < n)
    def _():
        _dma(s + 1, fields_hbm, fbuf, sem, bases_ref).start()

    _dma(s, fields_hbm, fbuf, sem, bases_ref).wait()
    buf = s % 2

    # Exact expand in 3 MXU passes instead of HIGHEST's 6: the one-hot is
    # exactly bf16 (0/1), so only the fields operand needs limb splitting.
    # All field values are non-negative integers <= 2^22 (offsets bounded by
    # the slot capacity; the sentinel is a power of two), so three 8-bit bf16
    # limbs reconstruct them exactly: hi = rne(a) errs <= 2^13, r1 = a - hi
    # is exact in f32 and errs <= 2^4 after the mid limb, and the residue is
    # an integer < 2^8, exact in bf16. Each limb x {0,1} product accumulates
    # in f32 on the MXU, and the final three-term f32 sum of integers < 2^24
    # is exact. Split once per superwindow into VMEM scratch; sub-chunk
    # windows are then ref loads at dynamic (128-multiple) lane offsets —
    # Mosaic has no dynamic_slice on values.
    f = fbuf[buf]  # (_FPAD, _WS)
    hi = f.astype(jnp.bfloat16)
    r1 = f - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    hi_ref[...] = hi
    mid_ref[...] = mid
    lo_ref[...] = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)

    base0 = _floor128(bases_ref[s * _S])
    for j in range(_S):
        # Sub-chunk window start within the superwindow: difference of two
        # 128-floored bases, hence itself a multiple of 128 (bases advance
        # at most _R rows per chunk, so delta + _W <= _WS always).
        delta = pl.multiple_of(
            _floor128(bases_ref[s * _S + j]) - base0, 128
        )

        # Offsets of the window's gaussians as a (_W, 1) sublane-major
        # column for the interval test (the DMA'd rows are lane-major).
        offs = jax.lax.transpose(
            fbuf[buf, 0:1, pl.ds(delta, _W)], (1, 0)
        )  # (_W, 1)
        # offs_{w+1}, via a sublane roll of the column (cheap: 1 lane
        # wide). Row _W-1 wraps junk; overwrite with the sentinel so it
        # owns nothing (the band keeps real owners below it anyway).
        nxt = pltpu.roll(offs, _W - 1, axis=0)
        row = jax.lax.broadcasted_iota(jnp.int32, (_W, 1), 0)
        nxt = jnp.where(row < _W - 1, nxt, _SENTINEL)

        slots = (
            (s * _S + j) * _R
            + jax.lax.broadcasted_iota(jnp.int32, (1, _R), 1)
        ).astype(jnp.float32)  # (1, R) exact small ints
        onehot = ((offs <= slots) & (nxt > slots)).astype(
            jnp.bfloat16
        )  # (_W, _R)

        def limb_dot(limb_ref, delta=delta, onehot=onehot):
            window = limb_ref[:, pl.ds(delta, _W)]  # (_FPAD, _W) bf16
            return jax.lax.dot_general(
                window, onehot,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )  # (_FPAD, _R)

        out_ref[:, j * _R : (j + 1) * _R] = (
            limb_dot(hi_ref) + limb_dot(mid_ref) + limb_dot(lo_ref)
        )


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
    step = _S * _R
    m_pad = -(-capacity // step) * step
    n_chunks = m_pad // _R

    offsets = fields_t[0]
    fields_p = jnp.pad(
        fields_t.astype(jnp.float32), ((0, _FPAD - F), (0, _WS + 128))
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
        grid=(m_pad // step,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((_FPAD, step), lambda s, b: (0, s)),
        scratch_shapes=[
            pltpu.VMEM((2, _FPAD, _WS), jnp.float32),
            pltpu.VMEM((_FPAD, _WS), jnp.bfloat16),  # hi limb
            pltpu.VMEM((_FPAD, _WS), jnp.bfloat16),  # mid limb
            pltpu.VMEM((_FPAD, _WS), jnp.bfloat16),  # lo limb
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
