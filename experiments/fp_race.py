"""Race: dense GEMM vs round-1 spmm24 kernel vs new pipelined FP kernel.

Run on TPU:
  JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
  JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0.5 \
  python experiments/fp_race.py
"""
import sys

import jax
import jax.numpy as jnp

from sparsifyme_tpu.ops.gemm import batched_gemm
from sparsifyme_tpu.ops.prune import prune_nm
from sparsifyme_tpu.ops.sparse24 import compress_24, spmm_24
from sparsifyme_tpu.ops.kernels.spmm24_kernel import (
    spmm24_pallas, spmm24_pallas_fp)
from sparsifyme_tpu.utils.timing import time_kernel

SHAPES = [
    (12544, 64, 576, 32),
    (12544, 64, 64, 32),
    (12544, 256, 64, 32),
    (3136, 128, 512, 32),
    (784, 256, 2304, 32),
    (196, 2048, 512, 32),
    (196, 512, 4608, 32),
]

def main():
    dtype = jnp.bfloat16
    only = sys.argv[1] if len(sys.argv) > 1 else None
    for (m, n, k, b) in SHAPES:
        if only and only not in f"{m}x{n}x{k}":
            continue
        key = jax.random.PRNGKey(0)
        ka, kb = jax.random.split(key)
        a = jax.random.normal(ka, (b, m, k), dtype)
        bm = jax.random.normal(kb, (k, n), dtype)
        pruned = jax.jit(lambda x: prune_nm(x, 2, 4)[0])(a)
        s = jax.jit(compress_24)(pruned)
        kp = 4 * s.values0.shape[0]
        bpad = jnp.pad(bm, ((0, kp - k), (0, 0)))
        flops = 2.0 * m * n * k * b

        t_dense = time_kernel(
            lambda x, y: batched_gemm(x, y, out_dtype=dtype),
            (a, bm), carrier=1).ms
        rows = [("dense", t_dense)]
        for tout in (False, True):
            t = time_kernel(
                lambda ss, y, _t=tout: spmm_24(ss, y, out_dtype=dtype,
                                               transpose_out=_t),
                (s, bm), carrier=1).ms
            rows.append((f"old t={int(tout)}", t))
        for tout in (False, True):
            t = time_kernel(
                lambda v0, v1, c, y, _t=tout: spmm24_pallas_fp(
                    v0, v1, c, y, k_logical=k, out_dtype=dtype,
                    transpose_out=_t),
                (s.values0, s.values1, s.codes, bpad), carrier=3).ms
            rows.append((f"fp  t={int(tout)}", t))
        print(f"== m={m} n={n} k={k} b={b}  dense={t_dense*1e3:8.1f}us "
              f"({flops/t_dense/1e9:6.1f} TF/s)")
        for name, t in rows[1:]:
            print(f"   {name:10s} {t*1e3:8.1f}us  {flops/t/1e9:6.1f} TF/s "
                  f" speedup={t_dense/t:5.2f}x")
        sys.stdout.flush()

if __name__ == "__main__":
    main()
