"""Timing-harness regression tests.

The timing loop has been defeated by XLA twice (SURVEY-era history):
arithmetic salts were strength-reduced (implied bandwidth above the HBM
speed of light), and barrier salts that dropped the kernel output were
dead-code-eliminated wholesale (optimized HLO contained zero dot ops and
measured ~0 ms/iter). These tests pin the fix: the kernel must survive in
the *optimized* HLO of the chained loop, and measured time must scale
with the iteration count.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparsifyme_tpu.utils.timing import chain, time_kernel


def _loop_hlo(step, state0, n=4):
    @jax.jit
    def run(state, nn):
        return jax.lax.fori_loop(0, nn, lambda i, s: step(s), state)

    return run.lower(state0, jnp.int32(n)).compile().as_text()


def test_carried_output_keeps_dot_alive():
    a = jnp.ones((64, 64), jnp.float32)
    b = jnp.ones((64, 64), jnp.float32)

    def step(state):
        (x, y), prev = state
        y = chain(y, prev)
        return ((x, y), x @ y)

    hlo = _loop_hlo(step, ((a, b), jnp.zeros((64, 64), jnp.float32)))
    assert " dot(" in hlo, "matmul was eliminated from the timed loop"


def test_dropped_output_is_eliminated():
    """Documents the failure mode: barrier-coupling WITHOUT carrying the
    output lets XLA prune the kernel entirely. If this ever starts
    keeping the dot, the guard in time_kernel is still correct, just
    conservative."""
    a = jnp.ones((64, 64), jnp.float32)
    b = jnp.ones((64, 64), jnp.float32)

    def bad_step(state):
        x, y = state
        c = x @ y
        y2, _ = jax.lax.optimization_barrier((y, c))
        return (x, y2)

    hlo = _loop_hlo(bad_step, (a, b))
    assert " dot(" not in hlo


def test_time_kernel_scales_with_work():
    big = jnp.ones((512, 512), jnp.float32)
    small = jnp.ones((64, 64), jnp.float32)
    t_big = time_kernel(lambda x: x @ x, (big,), iters=4, reps=2,
                        replicas=1)
    t_small = time_kernel(lambda x: x @ x, (small,), iters=4, reps=2,
                          replicas=1)
    # 512^3 vs 64^3 = 512x the FLOPs; require a conservative 3x.
    assert t_big.ms > 3 * max(t_small.ms, 1e-6)


def test_time_kernel_pytree_output():
    x = jnp.ones((32, 128), jnp.float32)
    t = time_kernel(lambda v: (v * 2, v * 3), (x,), iters=2, reps=2,
                    replicas=1)
    assert t.ms >= 0


def test_chain_is_identity_on_values():
    x = jnp.arange(8.0)
    y = jnp.ones((4,))
    out = jax.jit(lambda a, b: chain(a, b))(x, y)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_time_kernel_pair_ratio():
    """Paired A/B protocol: ratios are positive, spread >= 1, and both
    Timings carry per-call times (replica-normalized)."""
    import jax.numpy as jnp

    from sparsifyme_tpu.utils.timing import time_kernel_pair

    a = jnp.ones((256, 256), jnp.float32)
    b2 = jnp.ones((256, 256), jnp.float32)

    def dense(x, y):
        return x @ y

    def cheap(x, y):
        return x + y

    t = time_kernel_pair(dense, (a, b2), cheap, (a, b2),
                         carrier_a=1, carrier_b=1, iters=4, reps=3)
    assert t.a.ms >= 0 and t.b.ms >= 0
    assert t.ratio == t.ratio  # not NaN on CPU
    assert t.ratio > 0
    assert t.ratio_spread >= 1.0


def test_min_delta_env_override(monkeypatch):
    """SPARSIFYME_MIN_DELTA_S overrides the calibrated delta floor (the
    knob for trading sweep time against relay-jitter immunity)."""
    from sparsifyme_tpu.utils import timing

    monkeypatch.setattr(timing, "_min_delta_cache", None)
    monkeypatch.setenv("SPARSIFYME_MIN_DELTA_S", "0.123")
    try:
        assert timing.min_delta_s() == 0.123
    finally:
        timing._min_delta_cache = None  # do not poison other tests


def test_min_delta_cpu_default():
    """On the CPU backend the floor stays at the fast 8 ms default —
    test wall time must not inherit the accelerator calibration."""
    from sparsifyme_tpu.utils import timing

    timing._min_delta_cache = None
    try:
        assert timing.min_delta_s() == timing._MIN_DELTA_S
    finally:
        timing._min_delta_cache = None


def test_min_delta_env_bad_value(monkeypatch):
    """A non-numeric SPARSIFYME_MIN_DELTA_S gives a clear error, not an
    opaque float() crash in every timed path (ADVICE r4)."""
    from sparsifyme_tpu.utils import timing

    monkeypatch.setattr(timing, "_min_delta_cache", None)
    monkeypatch.setenv("SPARSIFYME_MIN_DELTA_S", "fast")
    try:
        with pytest.raises(ValueError, match="SPARSIFYME_MIN_DELTA_S"):
            timing.min_delta_s()
    finally:
        timing._min_delta_cache = None
