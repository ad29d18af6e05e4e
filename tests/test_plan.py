"""SpmmaPlan lifecycle tests (the cusparseLt plan-machinery analog)."""

import jax.numpy as jnp
import numpy as np

from sparsifyme_tpu.plan import SpmmaConfig, SpmmaPlan, get_plan, spmma


def _rand(rng, shape, dtype=jnp.float32):
    return jnp.asarray(rng.normal(size=shape), dtype)


def test_plan_phases(rng):
    cfg = SpmmaConfig(m=32, n=16, k=64, dtype="float32",
                      out_dtype="float32")
    plan = SpmmaPlan(cfg)
    a = _rand(rng, (32, 64))
    b = _rand(rng, (64, 16))
    pruned = plan.prune(a)
    assert bool(plan.prune_check(pruned))
    s = plan.compress(pruned)
    c = plan.matmul(s, b)
    want = np.asarray(pruned, np.float64) @ np.asarray(b, np.float64)
    np.testing.assert_allclose(np.asarray(c), want, rtol=1e-4, atol=1e-4)


def test_plan_fused_matches_phases(rng):
    cfg = SpmmaConfig(m=16, n=8, k=32, dtype="float32", out_dtype="float32")
    plan = SpmmaPlan(cfg)
    a = _rand(rng, (16, 32))
    b = _rand(rng, (32, 8))
    fused = plan(a, b)
    phased = plan.matmul(plan.compress(plan.prune(a)), b)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(phased), rtol=1e-5
    )


def test_plan_operand_cache(rng):
    cfg = SpmmaConfig(m=16, n=8, k=32, dtype="float32", out_dtype="float32")
    plan = SpmmaPlan(cfg)
    a = _rand(rng, (16, 32))
    s = plan.compress(plan.prune(a))
    plan.set_operand(s)
    b1 = _rand(rng, (32, 8))
    b2 = _rand(rng, (32, 8))
    c1 = plan.matmul_cached(b1)
    c2 = plan.matmul_cached(b2)
    np.testing.assert_allclose(
        np.asarray(c1), np.asarray(plan.matmul(s, b1)), rtol=1e-6
    )
    assert not np.allclose(np.asarray(c1), np.asarray(c2))


def test_get_plan_caches():
    cfg = SpmmaConfig(m=16, n=8, k=32)
    assert get_plan(cfg) is get_plan(SpmmaConfig(m=16, n=8, k=32))
    assert get_plan(cfg) is not get_plan(SpmmaConfig(m=16, n=8, k=64))


def test_spmma_one_shot_timed(rng):
    a = _rand(rng, (4, 16, 32))
    b = _rand(rng, (32, 8))
    out, times = spmma(a, b, timed=True)
    assert out.shape == (4, 16, 8)
    assert set(times) == {"prune", "compress", "mul", "fused"}
    assert all(t.ms > 0 for t in times.values())


def test_matmul_search_pins_algorithm():
    """cusparseLtMatmulSearch analog: picks a feasible candidate and the
    plan's matmul stays correct with it pinned."""
    import jax
    import numpy as np

    m, k, n = 32, 64, 48
    plan = SpmmaPlan(SpmmaConfig(m=m, n=n, k=k, out_dtype="float32"))
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (m, k), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.float32)
    pruned = plan.prune(a)
    s = plan.compress(pruned)
    want = np.asarray(plan.matmul(s, b))
    alg = plan.matmul_search(
        s, b,
        candidates=((None, None, None, False), (128, 128, 16, True)),
        iters=1, reps=1,
    )
    assert plan.algorithm == alg
    got = np.asarray(plan.matmul(s, b))
    if alg[-1]:  # C^T winner
        got = got.T
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_plan_row_chunks_only_table_entry(rng, monkeypatch):
    """A table entry setting only row_chunks/budget_mb (all block_* None,
    packed False) must still pass the eval_shape feasibility guard — the
    exact candidate shape the tuner emits (ADVICE r4 medium). An
    infeasible row_chunks must fall back to the heuristic instead of
    raising at the first matmul call."""
    import sparsifyme_tpu.bench.tuning as tuning

    # Infeasible: row_chunks=3 cannot split any 128-multiple m-tile.
    monkeypatch.setattr(
        tuning, "lookup",
        lambda m, n, k, b=1: {"spmm24": {"pipeline": True,
                                         "row_chunks": 3}},
    )
    cfg = SpmmaConfig(m=32, n=16, k=64, dtype="float32",
                      out_dtype="float32")
    plan = SpmmaPlan(cfg)
    a = _rand(rng, (32, 64))
    b = _rand(rng, (64, 16))
    pruned = plan.prune(a)
    s = plan.compress(pruned)
    c = plan.matmul(s, b)  # must not raise
    want = np.asarray(pruned, np.float64) @ np.asarray(b, np.float64)
    np.testing.assert_allclose(np.asarray(c), want, rtol=1e-4, atol=1e-4)


def test_plan_packed_operand_prepacked(rng, monkeypatch):
    """When the tuned algorithm is packed-codes, set_operand pre-packs
    once and matmul_cached consumes the pre-packed plane (no per-call
    pack — ADVICE r4); results match the unpacked path."""
    import sparsifyme_tpu.bench.tuning as tuning

    monkeypatch.setattr(
        tuning, "lookup",
        lambda m, n, k, b=1: {"spmm24": {"pipeline": True,
                                         "packed": True}},
    )
    cfg = SpmmaConfig(m=32, n=16, k=64, dtype="float32",
                      out_dtype="float32")
    plan = SpmmaPlan(cfg)
    assert plan._packed
    a = _rand(rng, (32, 64))
    b = _rand(rng, (64, 16))
    pruned = plan.prune(a)
    s = plan.compress(pruned)
    plan.set_operand(s)
    assert plan._operand_packed is not None
    c = plan.matmul_cached(b)
    want = np.asarray(pruned, np.float64) @ np.asarray(b, np.float64)
    np.testing.assert_allclose(np.asarray(c), want, rtol=1e-4, atol=1e-4)


def test_matmul_search_extended_tuples(rng):
    """7/8-slot candidates (row_chunks / budget_mb) search and pin
    correctly (VERDICT r4 item 9)."""
    m, k, n = 256, 256, 32
    plan = SpmmaPlan(SpmmaConfig(m=m, n=n, k=k, out_dtype="float32"))
    a = _rand(rng, (m, k))
    b = _rand(rng, (k, n))
    pruned = plan.prune(a)
    s = plan.compress(pruned)
    want = np.asarray(pruned, np.float64) @ np.asarray(b, np.float64)
    alg = plan.matmul_search(
        s, b,
        candidates=(
            (None, None, None, False, True, False, 2),      # row_chunks
            (None, None, None, False, True, False, 1, 24),  # budget_mb
        ),
        iters=1, reps=1,
    )
    assert plan.algorithm == alg
    got = np.asarray(plan.matmul(s, b))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_plan_folded_table_winner(rng, monkeypatch):
    """A fold=2 spmm24 table winner routes the plan's fused pipeline
    through the folded layout end-to-end (round 5)."""
    import sparsifyme_tpu.bench.tuning as tuning

    monkeypatch.setattr(
        tuning, "lookup",
        lambda m, n, k, b=1: {"spmm24": {"pipeline": True, "fold": 2}},
    )
    cfg = SpmmaConfig(m=32, n=16, k=64, dtype="float32",
                      out_dtype="float32")
    plan = SpmmaPlan(cfg)
    a = _rand(rng, (32, 64))
    b = _rand(rng, (64, 16))
    out = plan(a, b)
    pruned = plan.prune(a)
    want = np.asarray(pruned, np.float64) @ np.asarray(b, np.float64)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4,
                               atol=1e-4)
