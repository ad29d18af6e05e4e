"""Recompute the analytic SoL columns of bench_results.csv in place.

The measured `*_ms` columns are untouched (they are the measurement);
the `*_sol*` columns are pure analytics from `bench.roofline` and are
refreshed whenever the machine model changes (e.g. the MXU-assisted
ranking term added after a sweep had already been written).
"""
import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from sparsifyme_tpu.bench.roofline import (dense_sol_ms, fused_sol_ms,
                                           spmm24_sol_ms)
from sparsifyme_tpu.bench.tuning import lookup


def main(path="results/bench_results.csv"):
    with open(path) as f:
        rows = list(csv.DictReader(f))
    if not rows:
        print("no rows"); return
    for r in rows:
        m, n, k, b = (int(r["m"]), int(r["n"]), int(r["k"]), int(r["b"]))
        packed = bool(((lookup(m, n, k, b) or {}).get("spmm24") or {})
                      .get("packed"))
        r["fused_sol_ms"] = fused_sol_ms(m, k, b)
        fused = float(r.get("fused_ms") or "nan")
        r["fused_frac_sol"] = (r["fused_sol_ms"] / fused
                               if fused == fused and fused > 0 else "")
        r["sol24_ms"] = spmm24_sol_ms(m, n, k, b, packed_codes=packed)
        r["sol_speedup"] = dense_sol_ms(m, n, k, b) / r["sol24_ms"]
        s24 = float(r.get("spmm24_ms") or "nan")
        r["spmm24_frac_sol"] = (r["sol24_ms"] / s24
                                if s24 == s24 and s24 > 0 else "")
    cols = list(rows[0].keys())
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=cols)
        w.writeheader()
        w.writerows(rows)
    print(f"refreshed {len(rows)} rows in {path}")


if __name__ == "__main__":
    main(*sys.argv[1:])
