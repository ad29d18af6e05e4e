"""Wall-clock timing with warmup/compile exclusion.

TPU-native equivalent of the reference's `util::timer_t` CUDA-event timer
(`include/sparsify.me/util/timer.hxx:24-55`): on TPU, dispatch is async and
compilation is traced once, so honest kernel timing = jit + warmup
(compile excluded) + `block_until_ready` around a measured batch of
iterations. Unlike the reference harness — which timed each kernel in a
fresh process with cold caches (`examples/profiling.py:30-41`) — this
measures steady-state throughput, which is what production serving sees.
"""

from __future__ import annotations

import time
from typing import Any, Callable, NamedTuple

import jax


class Timing(NamedTuple):
    ms: float          # per-call wall milliseconds (median over reps)
    ms_min: float      # best rep
    iters: int         # calls per rep
    reps: int


def time_fn(
    fn: Callable[..., Any],
    *args: Any,
    warmup: int = 2,
    iters: int = 10,
    reps: int = 3,
    **kwargs: Any,
) -> Timing:
    """Time ``fn(*args)`` returning per-call milliseconds.

    ``fn`` should be jitted; the first ``warmup`` calls absorb compilation
    and are excluded. Each rep times ``iters`` back-to-back calls bracketed
    by ``block_until_ready`` (the cudaEvent begin/end analog).
    """
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        t1 = time.perf_counter()
        samples.append((t1 - t0) * 1e3 / iters)
    samples.sort()
    return Timing(
        ms=samples[len(samples) // 2],
        ms_min=samples[0],
        iters=iters,
        reps=reps,
    )
