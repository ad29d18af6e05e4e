#!/usr/bin/env python
"""Headline benchmark: 2:4 SpMM vs dense GEMM over ResNet-50 layer shapes.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The metric is the geometric-mean wall-clock speedup of the 2:4 structured-
sparse SpMM (Pallas MXU kernel, bf16) over the dense GEMM baseline (XLA
MXU matmul, bf16) across the ResNet-50 im2col layer-shape sweep — the
reference's published benchmark (`examples/compare.csv`, gemm vs spmm
columns). ``vs_baseline`` is measured against the BASELINE.json target of
1.5x dense FLOP/s per chip.

Usage: python bench.py [--model resnet50] [--quick] [--kernels gemm,spmm24,...]
"""

import argparse
import json
import os
import sys


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="resnet50")
    p.add_argument("--quick", action="store_true",
                   help="first 8 layers only (smoke test)")
    p.add_argument("--kernels", default="gemm,prune,spmm24,ell")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--csv", default="bench_results.csv")
    p.add_argument("--compare-csv", default="compare_tpu.csv")
    args = p.parse_args()

    # Persistent compilation cache: first sweep pays remote-compile cost
    # once; later runs are seconds.
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from sparsifyme_tpu.bench.harness import run_model_sweep

    results, summary = run_model_sweep(
        args.model,
        kernels=tuple(args.kernels.split(",")),
        iters=args.iters,
        reps=args.reps,
        csv_path=args.csv,
        compare_csv_path=args.compare_csv,
        max_layers=8 if args.quick else None,
        verbose=True,
    )

    for k, v in sorted(summary.items()):
        print(f"# {k}: {v}", file=sys.stderr)

    value = summary.get("best_sparse_speedup_geomean", float("nan"))
    if value != value:  # single-kernel runs (e.g. --kernels gemm,spmm24)
        value = summary.get(
            "spmm24_speedup_geomean", summary.get("ell_speedup_geomean")
        )
    print(
        json.dumps(
            {
                "metric": (
                    f"{args.model} sparse SpMM speedup vs dense GEMM, "
                    "best format per layer: 2:4 or blocked-ELL@50% "
                    "(geomean, bf16, 1 chip)"
                ),
                "value": round(value, 4),
                "unit": "x",
                "vs_baseline": round(value / 1.5, 4),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
