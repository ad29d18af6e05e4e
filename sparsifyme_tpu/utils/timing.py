"""Wall-clock timing with warmup/compile exclusion.

TPU-native equivalent of the reference's `util::timer_t` CUDA-event timer
(`include/sparsify.me/util/timer.hxx:24-55`), hardened for relayed TPU
transports where `jax.block_until_ready` acknowledges *dispatch*, not
device completion (measured: a 137-GFLOP matmul "completes" in 0.1 ms by
block_until_ready but takes ~24 ms to produce a fetchable scalar). Two
rules follow:

1. **Sync by fetching data.** The only trustworthy barrier is a
   device-to-host transfer: :func:`sync` runs a tiny jitted probe (sum of
   one state leaf) and fetches the 4-byte scalar. The fetch cannot return
   before everything it depends on has executed.
2. **Cancel the round trip by differencing.** The fetch pays a constant
   relay round trip (tens of ms through the tunnel). :func:`time_chained`
   times an N-iteration and a 2N-iteration on-device `lax.fori_loop` and
   reports ``(wall(2N) - wall(N)) / N`` — the constant cancels exactly.

The chained loop must (a) carry the kernel output in the loop state —
a value that is a root of the loop body cannot be dead-code-eliminated
and is materialized every iteration, exactly like real use — and (b)
couple the next iteration's input to the previous output through
`lax.optimization_barrier` so the compiler cannot hoist the
loop-invariant kernel out of the loop (:func:`chain` /
:func:`time_kernel` implement the pattern). Salting schemes that merge
the output into the carrier and then DROP the output are defeated: XLA
prunes unused optimization-barrier tuple elements and their operands,
eliminating the kernel entirely (verified in optimized HLO: zero dot
ops; measured: per-iteration deltas of ~0).

Unlike the reference harness — which timed each kernel in a fresh process
with cold caches (`examples/profiling.py:30-41`) — this measures
steady-state device throughput, which is what production serving sees.
"""

from __future__ import annotations

import time
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class Timing(NamedTuple):
    ms: float          # per-call wall milliseconds (median over reps)
    ms_min: float      # best rep
    iters: int         # calls per rep
    reps: int


@jax.jit
def _probe(leaf: jax.Array) -> jax.Array:
    return jnp.sum(leaf.astype(jnp.float32))


def sync(tree: Any) -> float:
    """True execution barrier: reduce the last leaf of ``tree`` on device
    and fetch the scalar. Returns the fetched value (useful as an
    optimization-defeating sink)."""
    leaf = jax.tree.leaves(tree)[-1]
    return float(_probe(leaf))


def time_fn(
    fn: Callable[..., Any],
    *args: Any,
    warmup: int = 2,
    iters: int = 10,
    reps: int = 3,
    **kwargs: Any,
) -> Timing:
    """Dispatch-loop timing: ``iters`` back-to-back dispatches bracketed
    by fetch-syncs, minus the measured empty-pipeline round trip.

    Prefer :func:`time_chained` for kernels; this exists for callables
    whose state cannot be threaded through a loop. The relay round trip
    is measured separately (median of ``reps`` empty syncs) and
    subtracted; results for sub-roundtrip kernels are noisy.
    """
    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    sync(out)
    # Median empty-pipeline round trip.
    rtts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(out)
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[len(rtts) // 2]
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args, **kwargs)
        sync(out)
        t1 = time.perf_counter()
        samples.append(max(t1 - t0 - rtt, 0.0) * 1e3 / iters)
    samples.sort()
    return Timing(
        ms=samples[len(samples) // 2],
        ms_min=samples[0],
        iters=iters,
        reps=reps,
    )


def time_chained(
    step: Callable[[Any], Any],
    state0: Any,
    *,
    iters: int = 32,
    reps: int = 3,
) -> Timing:
    """Time ``step`` (state -> state, same pytree structure) on-device.

    ``step`` MUST keep the kernel's output in the returned state (a
    loop-body root is always computed and materialized) and couple an
    input operand to the previous output via :func:`chain`, otherwise
    XLA hoists the loop-invariant computation out of the loop and you
    measure nothing. Use :func:`time_kernel` to get this right
    automatically.

    Runs ``iters`` and ``2*iters`` loops; reports the difference divided
    by ``iters`` (constant dispatch/round-trip cost cancels; see module
    docstring). Per-rep negatives (scheduling noise) are clamped to 0;
    the median over ``reps`` is returned.
    """

    # Dynamic trip count: ONE compiled executable serves both loop
    # lengths (remote compiles are the dominant cost on relayed
    # transports; a fori_loop with a traced bound lowers to while_loop,
    # which XLA cannot unroll — fine, since the body is the unit under
    # test either way).
    @jax.jit
    def run(state, n):
        return jax.lax.fori_loop(
            0, n, lambda i, s: step(s), state,
        )

    sync(run(state0, jnp.int32(iters)))  # compile + warmup
    sync(run(state0, jnp.int32(2 * iters)))

    # Adaptive: the N vs 2N wall delta must stand well above the relay
    # round-trip jitter (several ms), or fast kernels measure as noise /
    # zero. Doubling the trip count is free — the bound is traced, so
    # the same executable serves every N.
    min_delta_s = 8e-3
    while True:
        n1 = jnp.int32(iters)
        n2 = jnp.int32(2 * iters)
        raw = []
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(run(state0, n1))
            t1 = time.perf_counter()
            sync(run(state0, n2))
            t2 = time.perf_counter()
            raw.append((t2 - t1) - (t1 - t0))
        raw.sort()
        med = raw[len(raw) // 2]
        # 16384-iter ceiling: even a ~0.5 us/iter kernel accumulates
        # ~8 ms of on-device work, clear of the relay jitter floor.
        if med >= min_delta_s or iters >= 16384:
            break
        iters *= 2
    samples = [max(r, 0.0) * 1e3 / iters for r in raw]
    samples.sort()
    return Timing(
        ms=samples[len(samples) // 2],
        ms_min=samples[0],
        iters=iters,
        reps=reps,
    )


def chain(carrier: jax.Array, *deps: Any) -> jax.Array:
    """Couple ``carrier`` to ``deps`` (arrays or pytrees) through an
    optimization barrier: the returned carrier is numerically identical
    but the compiler must order it after every leaf of ``deps``.

    Use inside a :func:`time_chained` step to make iteration i+1's input
    depend on iteration i's output. The deps themselves must ALSO stay
    in the carried loop state — a barrier alone does not keep them
    alive: XLA prunes unused barrier outputs together with their
    operands. (An *arithmetic* salt is worse still: for a linear kernel
    the algebraic simplifier distributes ``x @ (y + s)`` and hoists the
    real work; observed measuring above the HBM speed of light.)
    """
    leaves = jax.tree.leaves(deps)
    if not leaves:
        return carrier
    out = jax.lax.optimization_barrier((carrier, *leaves))
    return out[0]


def time_kernel(
    fn: Callable[..., Any],
    operands: tuple,
    *,
    carrier: int = 0,
    iters: int = 16,
    reps: int = 3,
    replicas: Optional[int] = None,
) -> Timing:
    """Time ``fn(*operands)`` with the correct chained-loop structure.

    Builds a :func:`time_chained` step whose state is ``(operands,
    out)``: the output is a loop-body root (cannot be DCE'd, is
    materialized every iteration, like real use), and operand number
    ``carrier`` is barrier-coupled to the previous output (defeats
    loop-invariant hoisting). Pick a small operand as the carrier; the
    barrier itself moves no data.

    ``replicas``: number of independent problem copies cycled per
    iteration. Small working sets otherwise live entirely in VMEM
    across loop iterations (measured: a 102 MB/iter matmul at an
    implied 1.76 TB/s on 0.82 TB/s HBM), which flatters XLA ops vs
    custom-call kernels whose operands always stream from HBM. Sized
    automatically so the cycled footprint exceeds VMEM; reported time
    is per single kernel call.
    """
    shapes = jax.eval_shape(fn, *operands)
    # Zero-filled output as the initial carried value: only its shape
    # matters (it feeds a barrier), and eval_shape avoids paying a
    # remote compile for a throwaway executable.
    mk_out = lambda: jax.tree.map(
        lambda sd: jnp.zeros(sd.shape, sd.dtype), shapes)
    if replicas is None:
        nbytes = sum(
            x.size * x.dtype.itemsize
            for x in jax.tree.leaves(operands) + jax.tree.leaves(shapes)
        )
        # ~128 MB VMEM upper bound across TPU generations; 4x margin
        # (2x still showed above-HBM rates on ~100 MB working sets).
        replicas = max(1, min(6, -(-512 * 1024 * 1024 // max(nbytes, 1))))
    reps_sets = [
        tuple(jax.tree.map(jnp.copy, op) for op in operands)
        for _ in range(replicas)
    ]

    def step(state):
        sets, outs = state
        new_sets, new_outs = [], []
        for ops, prev in zip(sets, outs):
            ops = list(ops)
            ops[carrier] = chain(ops[carrier], prev)
            new_outs.append(fn(*ops))
            new_sets.append(tuple(ops))
        return (tuple(new_sets), tuple(new_outs))

    t = time_chained(
        step,
        (tuple(reps_sets), tuple(mk_out() for _ in range(replicas))),
        iters=iters, reps=reps,
    )
    return Timing(ms=t.ms / replicas, ms_min=t.ms_min / replicas,
                  iters=t.iters, reps=t.reps)
