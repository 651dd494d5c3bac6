"""Observability: stage timing, recompile counting, structured logging.

The reference has no logging subsystem — fallbacks and warnings are bare
print() calls (/root/reference/mojosplat/binning.py:274, rasterization.py:74,
render.py:74,85) and its only timing is the external benchmark's
cuda.synchronize-fenced wall clock (examples/benchmark_proj.py:124-145).
SURVEY.md section 5 calls for structured logging plus a recompile counter
(load-bearing given the no-recompile design goal) — this module provides both.
"""

from __future__ import annotations

import logging
import time
from contextlib import contextmanager
from dataclasses import dataclass, field

import jax

logger = logging.getLogger("mojosplat_tpu")


@dataclass
class StageTimer:
    """Wall-clock timing per pipeline stage, device-fenced.

    The JAX analogue of the reference benchmark's ``torch.cuda.synchronize()``
    fencing (benchmark_proj.py:131-141): each stage is timed to
    ``jax.block_until_ready`` on its outputs.
    """

    times: dict[str, list] = field(default_factory=dict)

    @contextmanager
    def stage(self, name: str, outputs_holder: list | None = None):
        t0 = time.perf_counter()
        yield
        if outputs_holder:
            jax.block_until_ready(outputs_holder)
        self.times.setdefault(name, []).append(time.perf_counter() - t0)

    def time_fn(self, name: str, fn, *args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        self.times.setdefault(name, []).append(time.perf_counter() - t0)
        return out

    def summary(self) -> dict[str, dict[str, float]]:
        out = {}
        for name, ts in self.times.items():
            out[name] = {
                "mean_ms": 1e3 * sum(ts) / len(ts),
                "min_ms": 1e3 * min(ts),
                "max_ms": 1e3 * max(ts),
                "count": len(ts),
            }
        return out


def compilation_count(fn) -> int:
    """Number of compiled variants a jitted function holds — the recompile
    counter of SURVEY.md section 5. A scene change must not grow this."""
    return fn._cache_size()


def log_render_aux(aux, step: int | None = None) -> dict:
    """Structured per-render metric dict from RenderAux; logs overflow
    warnings (the reference silently prints-and-drops, binning.py:202-206)."""
    rec = {
        "num_isects": int(aux.binning.num_isects),
        "isect_capacity_overflow": int(aux.binning.capacity_overflow),
        "tile_span_truncated": int(aux.binning.span_truncated),
        "tile_capacity_overflow": int(aux.raster.tile_overflow),
    }
    if step is not None:
        rec["step"] = step
    if rec["isect_capacity_overflow"] or rec["tile_capacity_overflow"]:
        logger.warning("render overflow: %s", rec)
    else:
        logger.debug("render metrics: %s", rec)
    return rec
