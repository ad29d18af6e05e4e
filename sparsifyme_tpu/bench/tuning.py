"""Committed per-shape kernel-algorithm table (the alg-cache analog).

cusparseLt persists algorithm selection per problem geometry
(`cusparseLtMatmulSearch` + alg-selection attributes, reference
`examples/libcusparse_lt/include/cusparseLt.h:262-277`); re-searching on
every benchmark run is what blew round 2's driver budget (13 timed
variants per shape, each a fresh remote compile). This module is the
TPU-native equivalent: an **in-tree JSON table** mapping ``(m, n, k, b)``
to the winning kernel configuration per op family. The benchmark harness
looks configurations up instead of racing candidates live; the offline
tuner (`python -m sparsifyme_tpu.bench.tune`) regenerates the table on
real hardware.

Schema (one entry per shape)::

    "12544x64x256x32": {
      "spmm24": {"block_m": null, "block_n": null, "block_k4": null,
                 "transpose_out": true, "pipeline": true, "ms": 0.31},
      "ell":    {"formulation": "gather", "transpose_out": true,
                 "block_size": 128, "block_k": 32, "ms": 0.20},
      "gemm":   {"fold": true, "ms": 0.35}
    }

``ms`` fields are the tuner's measurements (documentation; the harness
re-times the winner). Missing shapes/op families fall back to the
harness's live best-of search, so the table is an accelerator, never a
correctness dependency.
"""

from __future__ import annotations

import functools
import json
import os
from typing import Dict, Optional

TABLE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "tuning_table.json")


def shape_key(m: int, n: int, k: int, b: int) -> str:
    return f"{m}x{n}x{k}x{b}"


@functools.lru_cache(maxsize=1)
def _load(path: str) -> Dict[str, Dict]:
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


def load_table(path: Optional[str] = None) -> Dict[str, Dict]:
    return _load(path or TABLE_PATH)


def lookup(m: int, n: int, k: int, b: int,
           path: Optional[str] = None) -> Optional[Dict]:
    """Table entry for a shape, or None (harness falls back to search)."""
    return load_table(path).get(shape_key(m, n, k, b))


def save_table(table: Dict[str, Dict], path: Optional[str] = None) -> None:
    path = path or TABLE_PATH
    with open(path, "w") as f:
        json.dump(table, f, indent=1, sort_keys=True)
        f.write("\n")
    _load.cache_clear()
