"""Tracing / profiling annotations — the NVTX + cudaEvent analog.

The reference brackets its hot loops with NVTX ranges for nsight
timelines (`nvtxRangePushA("batched-SpMM")`, reference
`include/sparsify.me/spmm.hxx:92,121`) and exports chrome traces from
torch.profiler (`datasets/get_shapes.py:79-85`). TPU-native equivalents:

* :func:`trace_range` — `jax.named_scope` context manager: names show up
  in XLA HLO and in profiler timelines (the `nvtxRangePushA` analog).
* :func:`profile_trace` — `jax.profiler.trace` wrapper writing a
  TensorBoard/perfetto-loadable trace directory (the chrome-trace
  export analog).
* :func:`annotate` — decorator form of :func:`trace_range`.
"""

from __future__ import annotations

import contextlib
import functools
from typing import Any, Callable, Iterator, Optional

import jax


@contextlib.contextmanager
def trace_range(name: str) -> Iterator[None]:
    """Named range visible in HLO and profiler timelines."""
    with jax.named_scope(name):
        yield


def annotate(name: Optional[str] = None):
    """Decorator: run the function body inside a named scope."""

    def deco(fn: Callable[..., Any]) -> Callable[..., Any]:
        scope = name or fn.__qualname__

        @functools.wraps(fn)
        def wrapper(*args: Any, **kwargs: Any) -> Any:
            with jax.named_scope(scope):
                return fn(*args, **kwargs)

        return wrapper

    return deco


@contextlib.contextmanager
def profile_trace(log_dir: str, *, create_perfetto_link: bool = False):
    """Capture a device profile into ``log_dir`` (view with TensorBoard's
    profile plugin or perfetto). Wraps ``jax.profiler.trace``."""
    with jax.profiler.trace(log_dir,
                            create_perfetto_link=create_perfetto_link):
        yield
