"""Segment-slice gather Pallas kernel: padded per-tile re-layout at bandwidth.

The dense rasterization layout needs, for every tile t, the slice
``src[start_t : start_t + cap]`` of the (tile, depth)-sorted intersection
list. As an XLA gather this is ~30 ms at 1080p (scalar-core bound per
element); but the reads are *contiguous per tile*, so one DMA per tile does
it at memory bandwidth. The only wrinkle is alignment: Mosaic requires
128-aligned dynamic lane offsets, so each DMA starts at the 128-floor of
start_t and a dynamic circular roll shifts the residue away in VMEM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(starts_ref, src_hbm, out_ref, buf, sem, *, cap):
    t = pl.program_id(0)
    start = starts_ref[t]
    astart = pl.multiple_of((start // 128) * 128, 128)
    dma = pltpu.make_async_copy(
        src_hbm.at[:, pl.ds(astart, cap + 128)], buf, sem
    )
    dma.start()
    dma.wait()
    r = start - astart  # 0..127 residue
    # Roll left by r (circular right-roll of width - r when r > 0).
    width = cap + 128
    shifted = pltpu.roll(buf[...], jnp.where(r == 0, 0, width - r), axis=1)
    out_ref[...] = shifted[:, :cap]


def segment_slice_gather(src, starts, cap, interpret=False):
    """out[t*cap + j] = src[starts[t] + j] for j in [0, cap).

    Args:
        src: (M,) array (any 4-byte dtype). Reads may touch up to
            ``floor(max(starts)/128)*128 + cap + 128`` elements, so the
            caller must pad ``src`` accordingly (this function pads by
            cap + 256 for safety).
        starts: (n_tiles,) int32 slice starts into src (non-negative).
        cap: static slice length, multiple of 128.

    Returns (n_tiles * cap,) of src.dtype.
    """
    if cap % 128 != 0:
        raise ValueError(f"cap must be a multiple of 128, got {cap}")
    n_tiles = starts.shape[0]
    src2 = jnp.pad(src, (0, cap + 256))[None, :]  # (1, M + cap + 256)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, cap), lambda t, s: (0, t)),
        scratch_shapes=[
            pltpu.VMEM((1, cap + 128), src.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    import functools

    out = pl.pallas_call(
        functools.partial(_kernel, cap=cap),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, n_tiles * cap), src.dtype),
        interpret=interpret,
    )(starts.astype(jnp.int32), src2)
    return out[0]
