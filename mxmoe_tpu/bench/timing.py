"""Device timing with the reference's measurement protocol, adapted to an
async-dispatch device path.

Mirrors ``test_utils.h:97-191`` (bench_func) in spirit: warmup, repeated
timed iterations, robust aggregate. On this TPU attachment, dispatch is
asynchronous and a host readback costs a large fixed roundtrip (~30 ms), so
per-iteration walls would measure latency, not kernel time. We instead use
a two-point slope: time N1 and N2 chained iterations each ended by a scalar
readback; per-iteration cost = (t(N2) - t(N1)) / (N2 - N1). The device
executes launches in order, so the final readback fences all of them.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable

import jax
import numpy as np


def _force(out) -> None:
    """Block until the last dispatched computation is done (tiny readback)."""
    leaves = jax.tree_util.tree_leaves(out)
    x = leaves[-1]
    np.asarray(jax.device_get(x.ravel()[0] if hasattr(x, "ravel") else x))


@dataclasses.dataclass(frozen=True)
class BenchResult:
    median_ms: float      # per-iteration time (slope estimate, median of repeats)
    best_ms: float        # min over repeats
    std_ms: float
    repeats: int

    def tflops(self, flops: int | float) -> float:
        return flops / (self.median_ms * 1e-3) / 1e12


def bench_fn(
    fn: Callable,
    *args,
    warmup: int = 3,
    n1: int = 5,
    n2: int = 25,
    repeats: int = 5,
    max_seconds: float = 30.0,
) -> BenchResult:
    """Per-iteration device time of ``fn(*args)`` via the slope protocol."""
    out = fn(*args)
    _force(out)
    for _ in range(warmup):
        out = fn(*args)
    _force(out)

    def chain(n: int) -> float:
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _force(out)
        return time.perf_counter() - t0

    # Scale n2 down if a single chain would blow the budget.
    t_probe = chain(n1)
    per = max(t_probe / n1, 1e-6)
    budget_iters = int(max_seconds / (per * repeats * 1.5)) or 1
    n2 = max(n1 + 1, min(n2, budget_iters))

    slopes = []
    t_start = time.perf_counter()
    for _ in range(repeats):
        ta = chain(n1)
        tb = chain(n2)
        slopes.append(max((tb - ta) / (n2 - n1), 1e-9))
        if time.perf_counter() - t_start > max_seconds and len(slopes) >= 2:
            break

    arr = np.array(slopes) * 1e3
    return BenchResult(
        median_ms=float(np.median(arr)),
        best_ms=float(arr.min()),
        std_ms=float(arr.std()),
        repeats=len(arr),
    )
