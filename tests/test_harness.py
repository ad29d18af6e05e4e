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


def test_plot_artifacts(tmp_path):
    """The reference's harnesses end in comparison plots
    (profiling.py:46-56, gemm_coo_compare.py:63-81); ours must render
    from the committed artifacts' schemas."""
    import json

    from sparsifyme_tpu.bench.plots import (plot_compare,
                                            plot_coo_crossover,
                                            plot_speedup)

    csv_path = tmp_path / "r.csv"
    csv_path.write_text(
        "layer,m,n,k,b,gemm_ms,prune_ms,ell_ms,spmm24_ms,"
        "ell_speedup,spmm24_speedup,sol_speedup,gemm24_pair_ms,"
        "ell_sol_ms\n"
        "0,128,64,64,2,1.0,0.5,0.4,0.6,2.5,1.6,1.2,1.0,0.3\n"
        "1,256,64,64,2,2.0,0.5,0.8,1.2,2.4,1.7,1.1,2.0,0.7\n"
    )
    out1 = plot_compare(str(csv_path), str(tmp_path / "c.png"))
    out2 = plot_speedup(str(csv_path), str(tmp_path / "s.png"))
    cfg2 = tmp_path / "config2.json"
    cfg2.write_text(json.dumps({
        "rows": [
            {"m": 128, "n": 64, "k": 64, "b": 2, "sparsity": s,
             "speedup_vs_dense": v}
            for s, v in [(0.5, 0.01), (0.9, 0.1), (0.99, 1.5)]
        ]
    }))
    out3 = plot_coo_crossover(str(cfg2), str(tmp_path / "x.png"))
    import os
    for p in (out1, out2, out3):
        assert os.path.exists(p) and os.path.getsize(p) > 1000


def test_coo_crossover_interpolation():
    """config2's crossover locator: log-interpolates the sparsity where
    COO first beats dense, per comparison protocol (kernel-only vs
    conversion-inclusive)."""
    from sparsifyme_tpu.bench.configs import _coo_crossovers

    rows = [
        {"m": 1, "n": 2, "k": 3, "b": 4, "sparsity": sp,
         "speedup_vs_dense": ko, "speedup_vs_dense_incl_conv": ic}
        for sp, ko, ic in [(0.9, 0.5, 0.2), (0.99, 2.0, 0.8),
                           (0.995, 4.0, 1.6)]
    ]
    out = _coo_crossovers(rows)
    e = out["1x2x3x4"]
    assert 0.9 < e["speedup_vs_dense"] < 0.99
    assert 0.99 < e["speedup_vs_dense_incl_conv"] <= 0.995
    # dense-wins-everywhere -> None
    rows2 = [dict(r, speedup_vs_dense=0.1,
                  speedup_vs_dense_incl_conv=0.05) for r in rows]
    assert _coo_crossovers(rows2)["1x2x3x4"]["speedup_vs_dense"] is None
