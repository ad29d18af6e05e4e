"""TPU experiment: adaptive mblk/bkb ELL + fat-bm spmm24 on laggard shapes.

Laggards from the last full sweep (bench_results.csv):
  L0  (12544,  64,  147)  ell 0.93x  spmm24 0.57x
  L1  (12544,  64,   64)  ell 0.57x  spmm24 1.15x
  L3  (12544, 256,   64)  ell 0.75x  spmm24 0.83x
  L24 (  784, 1024, 256)  ell 0.87x  spmm24 0.76x
  L23 (  784, 256, 2304)  ell 1.35x  spmm24 0.53x
Regression checks (previously good):
  L11 (3136, 128, 1152)  ell 1.71x   (bkb now 64)
  L25 ( 784, 256, 1024)  ell 2.01x   (bkb now 64)
"""
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from sparsifyme_tpu.bench.harness import bench_shape
from sparsifyme_tpu.utils.shapes import LayerShape

SHAPES = [
    (12544, 64, 147),
    (12544, 64, 64),
    (12544, 256, 64),
    (784, 1024, 256),
    (784, 256, 2304),
    (3136, 128, 1152),
    (784, 256, 1024),
]

for (m, n, k) in SHAPES:
    r = bench_shape(
        LayerShape(m, n, k, 32),
        kernels=("gemm", "spmm24", "ell"),
        iters=8, reps=3, verbose=True,
    )
    print(
        f"m={m} n={n} k={k}: gemm {r['gemm_ms']:.3f} "
        f"spmm24 {r.get('spmm24_ms', float('nan')):.3f} "
        f"({r.get('spmm24_speedup', float('nan')):.2f}x) "
        f"ell {r.get('ell_ms', float('nan')):.3f} "
        f"({r.get('ell_speedup', float('nan')):.2f}x)",
        flush=True,
    )
print("DONE", flush=True)
