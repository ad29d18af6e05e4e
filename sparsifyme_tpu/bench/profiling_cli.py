"""Reference-parity benchmark sweep over the native CLI drivers.

Re-implements `examples/profiling.py` exactly as the reference structures
it (L4 shells out to L3 binaries per shape, parses the stdout float,
writes `compare.csv` with columns `layer,m,n,k,b,gemm,prune,spmm` —
`profiling.py:4-44`), but against our native TPU drivers
(cpp/build/{gemm,sparsify,spmm}). The in-process harness
(`sparsifyme_tpu.bench.harness`) is the recommended path — this module
exists for driver-level integration coverage and CLI-contract parity.

Usage: python -m sparsifyme_tpu.bench.profiling_cli \
           [--shapes datasets/shapes.csv] [--bin cpp/build] [--limit N]
"""

from __future__ import annotations

import argparse
import csv
import os
import subprocess
import sys
from typing import List, Optional

from ..utils.shapes import read_shapes

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _run(binary: str, args: List[int], timeout: float) -> Optional[float]:
    """Run a driver and parse its single stdout float (profiling.py:8-17)."""
    try:
        proc = subprocess.run(
            [binary] + [str(a) for a in args],
            capture_output=True, text=True, timeout=timeout,
        )
    except (subprocess.TimeoutExpired, FileNotFoundError):
        return None
    if proc.returncode != 0:
        return None
    try:
        return float(proc.stdout.strip().splitlines()[-1])
    except (ValueError, IndexError):
        return None


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--shapes",
                   default=os.path.join(REPO, "datasets", "shapes.csv"))
    p.add_argument("--bin", default=os.path.join(REPO, "cpp", "build"))
    p.add_argument("--out", default="compare.csv")
    p.add_argument("--limit", type=int, default=None,
                   help="only the first N shapes")
    p.add_argument("--timeout", type=float, default=600.0,
                   help="per-driver-invocation timeout (remote compiles on "
                        "a cold cache are slow)")
    p.add_argument("--plot", default=None, metavar="PNG",
                   help="also render the grouped-bar comparison chart "
                        "(the finished profiling.py:46-56 plot)")
    args = p.parse_args(argv)

    shapes = read_shapes(args.shapes)
    if args.limit:
        shapes = shapes[:args.limit]

    rows = []
    for i, s in enumerate(shapes):
        gemm = _run(os.path.join(args.bin, "gemm"),
                    [s.m, s.n, s.k, s.b], args.timeout)
        # sparsify takes (m, k): the weight matrix dims (profiling.py:33).
        prune = _run(os.path.join(args.bin, "sparsify"),
                     [s.m, s.k], args.timeout)
        spmm = _run(os.path.join(args.bin, "spmm"),
                    [s.m, s.n, s.k, s.b], args.timeout)
        rows.append([i, s.m, s.n, s.k, s.b, gemm, prune, spmm])
        print(f"layer {i}: m={s.m} n={s.n} k={s.k} b={s.b} "
              f"gemm={gemm} prune={prune} spmm={spmm}", file=sys.stderr,
              flush=True)

    with open(args.out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["layer", "m", "n", "k", "b", "gemm", "prune", "spmm"])
        w.writerows(rows)
    print(f"wrote {args.out} ({len(rows)} layers)", file=sys.stderr)
    if args.plot:
        from .plots import plot_compare

        plot_compare(args.out, args.plot,
                     series=("gemm", "prune", "spmm"))
        print(f"wrote {args.plot}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
