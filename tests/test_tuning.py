"""Tuning-table (alg-cache analog) round-trip + harness consumption."""

import json

import jax.numpy as jnp
import numpy as np

from sparsifyme_tpu.bench.tuning import (load_table, lookup, save_table,
                                         shape_key)


def test_table_roundtrip(tmp_path):
    path = str(tmp_path / "table.json")
    entry = {"spmm24": {"pipeline": True, "transpose_out": True,
                        "ms": 0.5},
             "gemm": {"fold": True, "ms": 0.4}}
    save_table({shape_key(8, 8, 16, 2): entry}, path)
    assert lookup(8, 8, 16, 2, path) == entry
    assert lookup(9, 8, 16, 2, path) is None


def test_harness_consumes_table(tmp_path, monkeypatch):
    """A table entry restricts the harness to ONE timed variant per op
    family (the round-3 driver-budget fix)."""
    import sparsifyme_tpu.bench.tuning as tuning
    from sparsifyme_tpu.bench.harness import bench_shape
    from sparsifyme_tpu.utils.shapes import LayerShape

    path = str(tmp_path / "table.json")
    save_table({shape_key(16, 16, 32, 2): {
        "gemm": {"fold": True},
        "spmm24": {"pipeline": False, "transpose_out": False},
        "ell": {"formulation": "gather", "transpose_out": False,
                "block_size": 8, "block_k": 8},
    }}, path)
    monkeypatch.setattr(tuning, "TABLE_PATH", path)
    tuning._load.cache_clear()
    res = bench_shape(LayerShape(16, 16, 32, 2), iters=2, reps=1)
    assert res["gemm_ms"] == res["gemm_ms"]  # ran (not NaN)
    assert res["spmm24_ms"] == res["spmm24_ms"]
    assert res["ell_ms"] == res["ell_ms"]
    tuning._load.cache_clear()


def test_harness_consumes_packed_entry(tmp_path, monkeypatch):
    """A 'packed' spmm24 table entry routes the harness through the
    packed-codes pipelined kernel (split-half nibble plane)."""
    import sparsifyme_tpu.bench.tuning as tuning
    from sparsifyme_tpu.bench.harness import bench_shape
    from sparsifyme_tpu.utils.shapes import LayerShape

    path = str(tmp_path / "table.json")
    save_table({shape_key(16, 16, 32, 2): {
        "gemm": {"fold": True},
        "spmm24": {"packed": True, "transpose_out": True,
                   "pipeline": True},
    }}, path)
    monkeypatch.setattr(tuning, "TABLE_PATH", path)
    tuning._load.cache_clear()
    res = bench_shape(LayerShape(16, 16, 32, 2),
                      kernels=("gemm", "prune", "spmm24"),
                      iters=2, reps=1)
    assert res["spmm24_ms"] == res["spmm24_ms"]  # ran (not NaN)
    tuning._load.cache_clear()
