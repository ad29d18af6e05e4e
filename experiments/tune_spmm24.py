"""TPU microbench: spmm24 / ell / gemm on representative shapes,
optionally sweeping spmm24 tile configs. Usage:
  python tune_spmm24.py [--sweep] [--shapes i,j,k]
"""
import argparse, itertools, json, os, sys

import jax, jax.numpy as jnp

cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from sparsifyme_tpu.ops.gemm import batched_gemm
from sparsifyme_tpu.ops.prune import prune_nm
from sparsifyme_tpu.ops.sparse24 import compress_24, spmm_24
from sparsifyme_tpu.ops.ell import ell_from_dense, spmm_ell
from sparsifyme_tpu.utils.timing import time_kernel

SHAPES = [  # (m, n, k, b) — small-k BW-bound, mid, compute-bound, small-m
    (12544, 64, 64, 32),
    (12544, 64, 576, 32),
    (3136, 512, 128, 32),
    (784, 256, 2304, 32),
    (196, 2048, 512, 32),
]

def bench_shape(m, n, k, b, sweep=False):
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (b, m, k), dt)
    bm = jax.random.normal(jax.random.PRNGKey(1), (k, n), dt)
    flops = 2.0 * m * n * k * b
    tg = time_kernel(lambda x, y: batched_gemm(x, y, out_dtype=dt),
                     (a, bm), carrier=1, iters=16).ms
    print(f"shape m={m} n={n} k={k} b={b}: gemm {tg:.3f} ms "
          f"({flops/tg/1e9:.0f} TF/s)", flush=True)
    pruned = jax.jit(lambda x: prune_nm(x, 2, 4)[0])(a)
    tp = time_kernel(lambda x: prune_nm(x, 2, 4), (pruned,), iters=8).ms
    print(f"  prune    {tp:.3f} ms", flush=True)
    tc = time_kernel(compress_24, (pruned,), iters=8).ms
    print(f"  compress {tc:.3f} ms", flush=True)
    s = jax.jit(compress_24)(pruned)
    ts = time_kernel(lambda ss, y: spmm_24(ss, y, out_dtype=dt),
                     (s, bm), carrier=1, iters=16).ms
    print(f"  spmm24   {ts:.3f} ms ({flops/ts/1e9:.0f} TF/s) "
          f"speedup {tg/ts:.2f}x", flush=True)
    # ELL @50%
    bs = 128
    ru = lambda x, q: -(-x//q)*q
    kp, mp = ru(k, 2*bs), ru(m, bs)
    ap = jnp.pad(a, ((0,0),(0,mp-m),(0,kp-k)))
    bp = jnp.pad(bm, ((0,kp-k),(0,0)))
    e = jax.jit(lambda x: ell_from_dense(x, block_size=bs,
                                         ell_blocks=max(1,(kp//bs)//2)))(ap)
    te = time_kernel(lambda ee, y: spmm_ell(ee, y, out_dtype=dt),
                     (e, bp), carrier=1, iters=16).ms
    print(f"  ell      {te:.3f} ms ({flops/te/1e9:.0f} TF/s) "
          f"speedup {tg/te:.2f}x", flush=True)
    if sweep:
        best = (ts, None)
        for bmm, bnn, bkk in itertools.product((256, 512, 1024),
                                               (128, 256, 512),
                                               (32, 64, 128)):
            if bnn > ru(n,128) or bkk > ru(-(-k//4),16): continue
            try:
                t = time_kernel(
                    lambda ss, y: spmm_24(ss, y, out_dtype=dt,
                                          block_m=bmm, block_n=bnn,
                                          block_k4=bkk),
                    (s, bm), carrier=1, iters=16).ms
            except Exception as ex:
                print(f"    cfg ({bmm},{bnn},{bkk}): FAIL {type(ex).__name__}", flush=True)
                continue
            mark = " <--" if t < best[0] else ""
            print(f"    cfg ({bmm},{bnn},{bkk}): {t:.3f} ms{mark}", flush=True)
            if t < best[0]: best = (t, (bmm, bnn, bkk))
        print(f"  BEST spmm24 {best[0]:.3f} ms cfg={best[1]} "
              f"speedup {tg/best[0]:.2f}x", flush=True)

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweep", action="store_true")
    ap.add_argument("--shapes", default="")
    args = ap.parse_args()
    shapes = SHAPES
    if args.shapes:
        idx = [int(x) for x in args.shapes.split(",")]
        shapes = [SHAPES[i] for i in idx]
    for sh in shapes:
        bench_shape(*sh, sweep=args.sweep)
