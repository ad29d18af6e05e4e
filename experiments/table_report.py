"""Distill the committed tuning table into a headline summary artifact.

The table's `ms` fields are real on-device measurements (chained-loop
timer, winner per op family) from the offline tuner run — source:
`python -m sparsifyme_tpu.bench.tune` on the bench chip. This report
layer-weights them over the requested model's layer list (the same
weighting bench.py's geomeans use) and emits `results/tuner_summary.json`
with per-shape speedups and SoL context.

This is NOT a substitute for the harness sweep (`bench.py`); it is the
alg-search evidence, committed so the measurements survive relay
outages. The `source` field says exactly where each number came from.
"""
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from sparsifyme_tpu.bench.roofline import (dense_sol_ms, ell_sol_ms,
                                           spmm24_sol_ms)
from sparsifyme_tpu.bench.tuning import load_table, shape_key
from sparsifyme_tpu.models.resnet_shapes import resnet_conv_shapes


def geomean(xs):
    # Entries may lack an op family (r.get() -> None): drop non-numbers
    # before the NaN/positivity filter.
    xs = [x for x in xs
          if isinstance(x, (int, float)) and x == x and x > 0]
    return math.exp(sum(math.log(x) for x in xs) / len(xs)) if xs else float("nan")


def main(model="resnet50"):
    table = load_table()
    shapes = resnet_conv_shapes(model)  # one entry per LAYER (49)
    rows = []
    for s in shapes:
        e = table.get(shape_key(s.m, s.n, s.k, s.b))
        if not e:
            continue
        g = e.get("gemm", {}).get("ms")
        s24 = e.get("spmm24", {})
        ell = e.get("ell", {})
        packed = bool(s24.get("packed"))
        r = {
            "m": s.m, "n": s.n, "k": s.k, "b": s.b,
            "gemm_ms": g,
            "spmm24_ms": s24.get("ms"),
            "spmm24_alg": {k: v for k, v in s24.items() if k != "ms"},
            "ell_ms": ell.get("ms"),
            "ell_alg": {k: v for k, v in ell.items() if k != "ms"},
            "sol24_ms": spmm24_sol_ms(s.m, s.n, s.k, s.b,
                                      packed_codes=packed),
            "ell_sol_ms": ell_sol_ms(s.m, s.n, s.k, s.b),
            "dense_sol_ms": dense_sol_ms(s.m, s.n, s.k, s.b),
        }
        if g and r["spmm24_ms"]:
            r["spmm24_speedup"] = g / r["spmm24_ms"]
            r["spmm24_frac_sol"] = r["sol24_ms"] / r["spmm24_ms"]
        if g and r["ell_ms"]:
            r["ell_speedup"] = g / r["ell_ms"]
            r["ell_frac_sol"] = r["ell_sol_ms"] / r["ell_ms"]
        rows.append(r)
    out = {
        "source": "sparsifyme_tpu.bench.tune winner timings (chained-loop "
                  "timer, TPU v5e via axon relay); layer-weighted like "
                  "bench.py",
        "model": model,
        "layers": len(rows),
        "gemm_ms_geomean": geomean([r["gemm_ms"] for r in rows]),
        "spmm24_speedup_geomean": geomean(
            [r.get("spmm24_speedup") for r in rows]),
        "ell_speedup_geomean": geomean(
            [r.get("ell_speedup") for r in rows]),
        "best_sparse_speedup_geomean": geomean([
            max(x for x in (r.get("spmm24_speedup"),
                            r.get("ell_speedup")) if x) for r in rows
            if r.get("spmm24_speedup") or r.get("ell_speedup")]),
        "spmm24_frac_sol_geomean": geomean(
            [r.get("spmm24_frac_sol") for r in rows]),
        "ell_frac_sol_geomean": geomean(
            [r.get("ell_frac_sol") for r in rows]),
        "sol_speedup_geomean": geomean(
            [r["dense_sol_ms"] / r["sol24_ms"] for r in rows]),
        "rows": rows,
    }
    os.makedirs("results", exist_ok=True)
    with open("results/tuner_summary.json", "w") as f:
        json.dump(out, f, indent=1, default=float)
    for k, v in out.items():
        if isinstance(v, float):
            print(f"{k}: {v:.4f}")
    return out


if __name__ == "__main__":
    main(*sys.argv[1:])
