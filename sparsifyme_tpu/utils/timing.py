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


def _build_run(step: Callable[[Any], Any]) -> Callable:
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

    return run


def _delta(run: Callable, state0: Any, iters: int) -> float:
    """One N-vs-2N wall-clock difference in seconds (round trip cancels)."""
    t0 = time.perf_counter()
    sync(run(state0, jnp.int32(iters)))
    t1 = time.perf_counter()
    sync(run(state0, jnp.int32(2 * iters)))
    t2 = time.perf_counter()
    return (t2 - t1) - (t1 - t0)


_MIN_DELTA_S = 8e-3
# 16384-iter ceiling: even a ~0.5 us/iter kernel accumulates ~8 ms of
# on-device work, clear of the relay jitter floor.
_MAX_ITERS = 16384

_min_delta_cache: Optional[float] = None


def min_delta_s() -> float:
    """Minimum acceptable N/2N delta, calibrated once per process.

    Each leg of the difference includes one host<->device round trip;
    on the relayed TPU transport those round trips spike by tens of
    milliseconds (network jitter through the tunnel), and a spike on
    the MIDDLE sync subtracts directly from the delta. Round 4 observed
    deltas 2-5x below a kernel's HBM speed of light this way — an
    ~12 ms shortfall on a ~15 ms delta — so the 8 ms floor that round 3
    used sits INSIDE the jitter amplitude. Here the floor is raised to
    dwarf the observed empty-sync spread: 4x the trimmed spread,
    clamped to [60 ms, 150 ms] on accelerators. CPU runs (tests,
    interpret mode) keep the fast 8 ms floor, where wall clocks have no
    network leg. ``SPARSIFYME_MIN_DELTA_S`` (seconds, float) overrides.
    """
    global _min_delta_cache
    if _min_delta_cache is None:
        import os

        import jax

        env = os.environ.get("SPARSIFYME_MIN_DELTA_S")
        if env:
            try:
                _min_delta_cache = float(env)
            except ValueError:
                raise ValueError(
                    "SPARSIFYME_MIN_DELTA_S must be a float number of "
                    f"seconds (e.g. '0.06'), got {env!r}") from None
        elif jax.default_backend() == "cpu":
            _min_delta_cache = _MIN_DELTA_S
        else:
            x = jnp.zeros((8,), jnp.float32)
            sync(x)  # compile the probe + settle the link
            rtts = sorted(
                _timed_sync(x) for _ in range(11)
            )
            # Trimmed spread (drop one extreme per side): a single
            # outlier round trip must not balloon the floor — the
            # occasional spike is exactly what the median-of-reps
            # rejects; the floor only needs to dwarf the TYPICAL
            # spread. (An untrimmed max-min calibrated 137 ms once,
            # quadrupling every sweep for no accuracy gain.)
            spread = rtts[-2] - rtts[1]
            _min_delta_cache = min(max(0.06, 4.0 * spread), 0.15)
    return _min_delta_cache


def _timed_sync(x) -> float:
    t0 = time.perf_counter()
    sync(x)
    return time.perf_counter() - t0


def _measure(run: Callable, state0: Any, iters: int, reps: int):
    """Warm up, then collect ``reps`` N-vs-2N deltas, doubling ``iters``
    until the MEDIAN delta stands well above the relay round-trip
    jitter (see :func:`min_delta_s`). The stopping rule must use the
    median of the actual samples, not a separate one-shot probe: a
    single noise-spiked delta passes the threshold while the real
    samples sit inside the jitter floor — observed reporting a
    bandwidth-bound kernel at 2.7x above its HBM speed of light.
    Doubling is free: the loop bound is traced, so one executable
    serves every N.

    Returns ``(iters, raw_deltas_sorted_seconds)``.
    """
    floor = min_delta_s()
    sync(run(state0, jnp.int32(iters)))  # compile + warmup
    sync(run(state0, jnp.int32(2 * iters)))
    # Cheap calibration ladder: ONE delta probe per doubling (full-reps
    # ladders tripled the calibration cost for nothing — only the final
    # level's samples are reported), then the real reps at the chosen
    # level, still gated on their own median.
    while iters < _MAX_ITERS and _delta(run, state0, iters) < floor:
        iters *= 2
    while True:
        raw = sorted(_delta(run, state0, iters) for _ in range(reps))
        if raw[len(raw) // 2] >= floor or iters >= _MAX_ITERS:
            return iters, raw
        iters *= 2


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
    run = _build_run(step)
    iters, raw = _measure(run, state0, iters, reps)
    samples = [max(r, 0.0) * 1e3 / iters for r in raw]
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


class Prepared(NamedTuple):
    """A kernel wrapped for chained timing: jitted ``run(state, n)``
    loop, initial state, and the number of problem replicas cycled per
    iteration (reported times are per single call)."""

    run: Callable
    state0: Any
    replicas: int


def prepare_kernel(
    fn: Callable[..., Any],
    operands: tuple,
    *,
    carrier: int = 0,
    replicas: Optional[int] = None,
) -> Prepared:
    """Build the chained-loop runner for ``fn(*operands)``.

    The loop state is ``(operands, out)``: the output is a loop-body
    root (cannot be DCE'd, is materialized every iteration, like real
    use), and operand number ``carrier`` is barrier-coupled to the
    previous output (defeats loop-invariant hoisting). Pick a small
    operand as the carrier; the barrier itself moves no data.

    ``replicas``: number of independent problem copies cycled per
    iteration. Small working sets otherwise live entirely in VMEM
    across loop iterations (measured: a 102 MB/iter matmul at an
    implied 1.76 TB/s on 0.82 TB/s HBM), which flatters XLA ops vs
    custom-call kernels whose operands always stream from HBM. Sized
    automatically so the cycled footprint exceeds VMEM.
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

    state0 = (tuple(reps_sets), tuple(mk_out() for _ in range(replicas)))
    return Prepared(run=_build_run(step), state0=state0, replicas=replicas)


def time_kernel(
    fn: Callable[..., Any],
    operands: tuple,
    *,
    carrier: int = 0,
    iters: int = 16,
    reps: int = 3,
    replicas: Optional[int] = None,
) -> Timing:
    """Time ``fn(*operands)`` with the correct chained-loop structure
    (see :func:`prepare_kernel`); reported time is per single call."""
    p = prepare_kernel(fn, operands, carrier=carrier, replicas=replicas)
    iters, raw = _measure(p.run, p.state0, iters, reps)
    samples = [max(r, 0.0) * 1e3 / iters / p.replicas for r in raw]
    return Timing(
        ms=samples[len(samples) // 2],
        ms_min=samples[0],
        iters=iters,
        reps=reps,
    )


class PairTiming(NamedTuple):
    a: Timing
    b: Timing
    ratio: float       # median over reps of per-pair (a.ms / b.ms)
    ratio_spread: float  # max/min of the per-pair ratios (1.0 = stable)


def time_kernel_pair(
    fn_a: Callable[..., Any],
    operands_a: tuple,
    fn_b: Callable[..., Any],
    operands_b: tuple,
    *,
    carrier_a: int = 0,
    carrier_b: int = 0,
    iters: int = 16,
    reps: int = 3,
) -> PairTiming:
    """Paired A/B timing: the variance-proof speedup protocol.

    Dense-baseline throughput on the bench chip swings up to 3x between
    measurement episodes (same compiled executable, different chip clock
    state), so a speedup computed from two *independently taken* times
    inherits that swing (round-3: the same sweep's ELL geomean moved
    1.15x <-> 1.57x run-to-run). Here both kernels are calibrated once
    and then measured in **adjacent N/2N chained loops within the same
    few milliseconds, alternating A and B per rep**; the reported
    ``ratio`` is the median of the per-pair ratios, so any clock state
    common to a pair cancels. ``ratio_spread`` (max/min over pairs)
    is the self-diagnosis: > ~1.2 means the chip state moved *between*
    reps and the median is the defense.

    Returns per-call Timings for both kernels plus the paired ratio
    ``a.ms / b.ms`` (if A is the dense baseline and B the sparse kernel,
    ``ratio`` IS the speedup).
    """
    pa = prepare_kernel(fn_a, operands_a, carrier=carrier_a)
    pb = prepare_kernel(fn_b, operands_b, carrier=carrier_b)
    ia, _ = _measure(pa.run, pa.state0, iters, reps)
    ib, _ = _measure(pb.run, pb.state0, iters, reps)
    floor = min_delta_s()
    while True:
        raw_a, raw_b = [], []
        for _ in range(reps):
            raw_a.append(_delta(pa.run, pa.state0, ia))
            raw_b.append(_delta(pb.run, pb.state0, ib))
        # Same guard as _measure, per side: the paired deltas themselves
        # must clear the jitter floor, or the ratio is noise/noise.
        med_a = sorted(raw_a)[reps // 2]
        med_b = sorted(raw_b)[reps // 2]
        grow = False
        if med_a < floor and ia < _MAX_ITERS:
            ia *= 2
            grow = True
        if med_b < floor and ib < _MAX_ITERS:
            ib *= 2
            grow = True
        if not grow:
            break
    ms_a, ms_b, ratios = [], [], []
    for da_s, db_s in zip(raw_a, raw_b):
        da = max(da_s, 0.0) * 1e3 / ia / pa.replicas
        db = max(db_s, 0.0) * 1e3 / ib / pb.replicas
        ms_a.append(da)
        ms_b.append(db)
        if da > 0 and db > 0:
            ratios.append(da / db)
    sa, sb = sorted(ms_a), sorted(ms_b)
    ratios.sort()
    ratio = ratios[len(ratios) // 2] if ratios else float("nan")
    spread = (ratios[-1] / ratios[0]) if ratios else float("nan")
    return PairTiming(
        a=Timing(ms=sa[len(sa) // 2], ms_min=sa[0], iters=ia, reps=reps),
        b=Timing(ms=sb[len(sb) // 2], ms_min=sb[0], iters=ib, reps=reps),
        ratio=ratio,
        ratio_spread=spread,
    )
