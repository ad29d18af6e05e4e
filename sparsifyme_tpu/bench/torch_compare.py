"""Independent PyTorch cross-check: dense matmul vs sparse-with-conversion.

Capability parity with the reference's
`profiling/python/gemm_coo_compare.py` (SURVEY.md C18): for each layer
shape, measure (a) dense batched matmul and (b) sparse COO matmul
*including the dense->sparse conversion cost* at a given density — the
methodological point being that format-conversion time must be accounted
for in sparse-vs-dense comparisons (`gemm_coo_compare.py:9-43`).

Runs on CPU torch (the image ships no CUDA) — this is a cross-
implementation sanity baseline, not a TPU benchmark; the in-process JAX
harness (`bench.harness`) is the performance path. A JAX-vs-torch
numerical agreement check is included so the two stacks validate each
other (the reference used PyTorch the same way).

Usage: python -m sparsifyme_tpu.bench.torch_compare [--model resnet18]
           [--density 0.1] [--limit N]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from typing import Dict, List

import numpy as np


def time_torch_pair(m: int, n: int, k: int, b: int, density: float,
                    reps: int = 3) -> Dict[str, float]:
    """Dense bmm vs (to_sparse + COO mm), conversion cost included."""
    import torch

    torch.manual_seed(0)
    a = torch.randn(m, k)
    mask = torch.rand(m, k) < density
    a = a * mask
    bmat = torch.randn(b, k, n)

    dense_s, sparse_s, convert_s = [], [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        out_d = torch.matmul(a, bmat)
        dense_s.append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        a_sp = a.to_sparse()
        t1 = time.perf_counter()
        out_s = torch.stack([torch.sparse.mm(a_sp, bmat[i])
                             for i in range(b)])
        t2 = time.perf_counter()
        convert_s.append(t1 - t0)
        sparse_s.append(t2 - t1)

    err = float(
        torch.linalg.norm(out_s - out_d) / torch.linalg.norm(out_d)
    )
    return {
        "dense_ms": 1e3 * float(np.median(dense_s)),
        "sparse_ms": 1e3 * float(np.median(sparse_s)),
        "convert_ms": 1e3 * float(np.median(convert_s)),
        "rel_err": err,
    }


def jax_torch_agreement(m: int = 64, k: int = 128, n: int = 32) -> float:
    """Numerical agreement of the JAX 2:4 pipeline vs a torch oracle."""
    import jax.numpy as jnp
    import torch

    from ..ops.prune import prune_nm
    from ..ops.sparse24 import compress_24, spmm_24

    rng = np.random.default_rng(0)
    a = rng.standard_normal((m, k)).astype(np.float32)
    bmat = rng.standard_normal((k, n)).astype(np.float32)
    pruned, _ = prune_nm(jnp.asarray(a), 2, 4)
    out_jax = np.asarray(
        spmm_24(compress_24(pruned), jnp.asarray(bmat),
                out_dtype=jnp.float32)
    )
    out_torch = (
        torch.from_numpy(np.asarray(pruned)) @ torch.from_numpy(bmat)
    ).numpy()
    denom = np.linalg.norm(out_torch)
    return float(np.linalg.norm(out_jax - out_torch) / denom)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="resnet18")
    p.add_argument("--density", type=float, default=0.1,
                   help="fraction of nonzeros (reference used 0.1)")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--batch", type=int, default=4,
                   help="smaller than the datasets' b=32: CPU torch")
    args = p.parse_args(argv)

    from ..models.resnet_shapes import resnet_conv_shapes

    shapes = sorted(set(resnet_conv_shapes(args.model)))
    if args.limit:
        shapes = shapes[:args.limit]

    rows: List[Dict] = []
    for s in shapes:
        r = time_torch_pair(s.m, s.n, s.k, args.batch, args.density)
        r.update(m=s.m, n=s.n, k=s.k, b=args.batch)
        rows.append(r)
        print(f"m={s.m} n={s.n} k={s.k}: dense {r['dense_ms']:.2f}ms "
              f"sparse {r['sparse_ms']:.2f}ms "
              f"(+convert {r['convert_ms']:.2f}ms) err {r['rel_err']:.1e}",
              file=sys.stderr, flush=True)

    agree = jax_torch_agreement()
    summary = {
        "points": len(rows),
        "density": args.density,
        "dense_ms_median": float(np.median([r["dense_ms"] for r in rows])),
        "sparse_plus_convert_ms_median": float(
            np.median([r["sparse_ms"] + r["convert_ms"] for r in rows])
        ),
        "jax_torch_rel_err": agree,
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
