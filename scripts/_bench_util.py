"""Shared scan-slope timing for the probe scripts (bench.py methodology).

Through the axon relay, repeated IDENTICAL jitted calls may be RESULT-
CACHED (CLAUDE.md): a timed call that re-sends the warmup's exact argument
bytes can return in ~30 ms of dispatch without executing, and min() then
reports a cache hit as the step time.  The contract here makes that
impossible to forget: `make_chain(K)` must return a function of `seed`
that folds the seed into the computation's INPUTS, and `slope` passes a
DIFFERENT seed to every call — warmup included.
"""
from __future__ import annotations

import time


def slope(make_chain, k1: int = 1, k2: int = 5, tries: int = 3) -> float:
    """Per-iteration time from the K-slope of dependency-chained steps.

    make_chain(K) -> fn(seed: float) running K chained iterations inside
    one jit call and materializing a scalar (float()) so execution is
    forced.  Returns (t_k2 - t_k1) / (k2 - k1) with each point the min of
    `tries` calls, every call at a fresh seed."""
    def run(K, base):
        c = make_chain(K)
        c(float(base))  # compile + warm at its own seed
        ts = []
        for i in range(tries):
            t0 = time.perf_counter()
            c(float(base + i + 1))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1, tk = run(k1, 0.0), run(k2, 100.0)
    return (tk - t1) / (k2 - k1)
