"""Benchmark-harness smoke tests (round-1 VERDICT test gap).

The harness is the `examples/profiling.py` analog; these tests run
`bench_shape` end-to-end on CPU (interpret-mode Pallas) on shapes the
sweep actually contains — including the m=1 MobileNetV3 squeeze-excite
1x1 convs (`models/conv_zoo.py`), the degenerate row count the round-1
suite never pushed through the harness.
"""

import math

import pytest

from sparsifyme_tpu.bench.harness import bench_shape
from sparsifyme_tpu.utils.shapes import LayerShape


def _check_common(out):
    for key in ("gemm_ms", "prune_ms", "compress_ms", "fused_ms",
                "spmm24_ms", "ell_ms"):
        assert key in out, key
        assert out[key] > 0 and math.isfinite(out[key]), (key, out[key])
    assert out["sol24_ms"] > 0
    assert 0.9 <= out["sol_speedup"] <= 2.0


def test_bench_shape_m1_squeeze_excite():
    # MobileNetV3 SE block: 1x1 conv at 1x1 spatial -> m=1 GEMM rows
    # (conv_zoo.py SE entries). The ELL path pads m to one 128-block;
    # 2:4 folds batch into rows.
    out = bench_shape(
        LayerShape(m=1, n=16, k=64, b=4), iters=1, reps=1
    )
    _check_common(out)


def test_bench_shape_small_regular():
    out = bench_shape(
        LayerShape(m=16, n=16, k=32, b=2), iters=1, reps=1
    )
    _check_common(out)
    assert out["spmm24_speedup"] > 0
    assert out["ell_speedup"] > 0


def test_bench_shape_fold_first_heuristic():
    """m % 128 != 0 but m*b % 128 == 0: the ELL path folds the batch
    before block selection (round-4; no per-sample m padding)."""
    out = bench_shape(
        LayerShape(m=64, n=16, k=64, b=2), iters=1, reps=1
    )
    _check_common(out)
    assert out["ell_frac_sol"] > 0
    assert out["gemmell_pair_ms"] > 0


def test_build_ell_operand_fold_shapes():
    import jax.numpy as jnp

    from sparsifyme_tpu.bench.harness import build_ell_operand

    a = jnp.ones((2, 64, 256), jnp.float32)
    e, kp = build_ell_operand(a, block_size=128, block_k=64,
                              fold_first=True)
    assert e.shape == (128, 256) and kp == 256
    e2, _ = build_ell_operand(a, block_size=128, block_k=64,
                              fold_first=False)
    assert e2.shape == (2, 128, 256)
