"""Banded segment-expand Pallas kernel: per-slot rows from per-gaussian rows.

The binning expansion needs each intersection slot to read its owner
gaussian's fields (offsets, tile span, tile mins, depth). As an XLA gather
that costs ~20 ms at 1080p (scalar-core bound per row). But the slot->owner
mapping is monotone with unit steps when owners are indexed by their
*compact rank* (rank among gaussians with nonzero tile count): consecutive
slots' ranks differ by at most 1, so a chunk of R slots touches at most R
consecutive compacted rows. Each grid step then DMAs its window of compacted
rows sequentially and expands with a one-hot matmul on the MXU:

    out[:, r] = sum_w [rank_r - base == w] * fields[:, base + w]

exactly the transpose of the banded segment-sum (segsum_pallas.py).
All HBM traffic is sequential; ~6x faster than the gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_R = 512  # slots per grid step
_FPAD = 8  # field-major sublane count (fields padded up to this)


def _kernel(bases_ref, fields_hbm, rank_hbm, out_ref, fbuf, rbuf, sem, *, F):
    c = pl.program_id(0)
    base = pl.multiple_of((bases_ref[c] // 128) * 128, 128)

    fdma = pltpu.make_async_copy(
        fields_hbm.at[:, pl.ds(base, _R + 256)], fbuf, sem.at[0]
    )
    rdma = pltpu.make_async_copy(
        rank_hbm.at[:, pl.ds(c * _R, _R)], rbuf, sem.at[1]
    )
    fdma.start()
    rdma.start()
    fdma.wait()
    rdma.wait()

    rel = rbuf[...] - base.astype(jnp.float32)  # (1, R) exact small ints
    w = jax.lax.broadcasted_iota(jnp.int32, (_R + 256, _R), 0).astype(
        jnp.float32
    )
    onehot = (rel == w).astype(jnp.float32)  # (W, R)
    out_ref[...] = jax.lax.dot_general(
        fbuf[...], onehot, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
    )  # (_FPAD, R)


def segment_expand(fields_t, ranks, interpret=False):
    """out[:, s] = fields_t[:, ranks[s]] where ranks is non-decreasing with
    unit steps (a compact-rank array).

    Args:
        fields_t: (F, Nc) f32 field-major compacted per-gaussian rows,
            F <= 8. (Extra columns beyond the real compact count are fine —
            they are only read if referenced.)
        ranks: (M,) int32 non-decreasing, ranks[s+1] - ranks[s] in {0, 1};
            values in [0, Nc).

    Returns (F, M_pad >= M) f32; slice [:, :M]. Rows whose rank exceeds the
    window (cannot happen for valid input) read as 0.
    """
    F, Nc = fields_t.shape
    if F > _FPAD:
        raise ValueError(f"at most {_FPAD} fields, got {F}")
    M = ranks.shape[0]
    m_pad = -(-M // _R) * _R
    n_chunks = m_pad // _R

    fields_p = jnp.pad(
        fields_t.astype(jnp.float32),
        ((0, _FPAD - F), (0, _R + 384)),
    )
    ranks_p = jnp.pad(ranks, (0, m_pad - M)).astype(jnp.float32)[None, :]
    bases = jnp.pad(ranks, (0, m_pad - M))[:: _R].astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((_FPAD, _R), lambda c, b: (0, c)),
        scratch_shapes=[
            pltpu.VMEM((_FPAD, _R + 256), jnp.float32),
            pltpu.VMEM((1, _R), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, F=_FPAD),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((_FPAD, m_pad), jnp.float32),
        interpret=interpret,
    )(bases, fields_p, ranks_p)
    return out[:F]
