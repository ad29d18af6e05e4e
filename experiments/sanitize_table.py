"""Flag (and optionally drop) physically impossible tuning-table entries.

A committed winner whose recorded ``ms`` sits below 0.85x the shape's
analytic speed-of-light (bench.roofline) was measured through a
jitter-contaminated N/2N delta (a relay round-trip spike on the middle
sync subtracts from the difference — observed 2-5x-below-HBM-floor
"winners" in the round-4 tune pass). The config itself may be valid,
but the winner SELECTION is untrustworthy: a rogue-low sample beat
honestly timed candidates.

Usage::

    python -m experiments.sanitize_table            # report only
    python -m experiments.sanitize_table --drop     # delete flagged op
                                                    # entries (tuner will
                                                    # re-tune them fresh)

Prints one line per flagged (shape, op) and a summary shaped for
`tune.main --shapes ... --ops ...` re-tune commands.
"""

from __future__ import annotations

import argparse
import collections
import json

from sparsifyme_tpu.bench.roofline import (dense_sol_ms, ell_sol_ms,
                                           fused_sol_ms, spmm24_sol_ms)
from sparsifyme_tpu.bench.tuning import TABLE_PATH

GUARD = 0.85


def floor_ms(op: str, m: int, n: int, k: int, b: int, entry: dict) -> float:
    if op == "gemm":
        return dense_sol_ms(m, n, k, b)
    if op == "spmm24":
        return spmm24_sol_ms(m, n, k, b,
                             packed_codes=bool(entry.get("packed")))
    if op == "ell":
        return ell_sol_ms(m, n, k, b)
    if op == "fused":
        return fused_sol_ms(m, k, b)
    return 0.0


def flagged_entries(table: dict):
    """Yield (shape_key, op, recorded_ms, floor) for sub-floor winners."""
    for key, entry in sorted(table.items()):
        m, n, k, b = (int(x) for x in key.split("x"))
        for op, cfg in sorted(entry.items()):
            ms = cfg.get("ms")
            if not isinstance(ms, (int, float)) or not ms > 0:
                continue
            fl = floor_ms(op, m, n, k, b, cfg)
            if fl and ms < GUARD * fl:
                yield key, op, ms, fl


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--table", default=TABLE_PATH)
    p.add_argument("--drop", action="store_true",
                   help="delete flagged op entries from the table")
    args = p.parse_args(argv)

    with open(args.table) as f:
        table = json.load(f)

    by_op = collections.defaultdict(list)
    nflag = 0
    for key, op, ms, fl in flagged_entries(table):
        nflag += 1
        by_op[op].append(key)
        print(f"FLAG {key:22s} {op:7s} ms={ms:.5f} < {GUARD}*floor "
              f"{fl:.5f} ({ms / fl:.2f}x of SoL)")
    if not nflag:
        print("table clean: no sub-floor winners")
        return 0
    for op, keys in sorted(by_op.items()):
        print(f"\nre-tune: --ops {op} --fresh --shapes {','.join(keys)}")
    if args.drop:
        for op, keys in by_op.items():
            for key in keys:
                del table[key][op]
        with open(args.table, "w") as f:
            json.dump(table, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"\ndropped {nflag} flagged entries -> {args.table}")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
