"""TPU experiment: spmm24 v4 first, then prune tile variants, compress."""
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from sparsifyme_tpu.utils.timing import time_kernel
from sparsifyme_tpu.ops.prune import prune_nm
from sparsifyme_tpu.ops.kernels.prune_kernel import prune_nm_pallas
from sparsifyme_tpu.ops.sparse24 import compress_24, spmm_24
from sparsifyme_tpu.ops.gemm import batched_gemm

key = jax.random.PRNGKey(0)
for (m, n, k, b) in [(12544, 64, 64, 32), (12544, 64, 576, 32),
                     (784, 256, 2304, 32), (196, 2048, 512, 32)]:
    a = jax.random.normal(key, (b, m, k), jnp.bfloat16)
    bm = jax.random.normal(key, (k, n), jnp.bfloat16)
    flops = 2.0*m*n*k*b
    pruned = jax.jit(lambda x: prune_nm(x, 2, 4)[0])(a)
    s = jax.jit(compress_24)(pruned)
    tg = time_kernel(lambda x, y: batched_gemm(x, y, out_dtype=jnp.bfloat16),
                     (a, bm), carrier=1, iters=16).ms
    tg2 = time_kernel(lambda x, y: batched_gemm(x, y, out_dtype=jnp.bfloat16,
                                                fold=False),
                      (a, bm), carrier=1, iters=16).ms
    tg = min(tg, tg2)
    ts = time_kernel(lambda ss, y: spmm_24(ss, y, out_dtype=jnp.bfloat16),
                     (s, bm), carrier=1, iters=16).ms
    print(f"m={m} n={n} k={k}: gemm {tg:.3f} spmm24 {ts:.3f} "
          f"({flops/ts/1e9:.0f} TF/s) speedup {tg/ts:.2f}x", flush=True)
    for br in (1024, 2048, 4096):
        tp = time_kernel(lambda x: prune_nm_pallas(x, 2, 4, block_rows=br),
                         (pruned,), iters=8).ms
        gbs = (3*a.size*2)/tp/1e6
        print(f"  prune br={br}: {tp:.3f} ms ({gbs:.0f} GB/s)", flush=True)
    tc = time_kernel(compress_24, (pruned,), iters=8).ms
    gbs = (a.size*2*2 + a.size*0.625)/tc/1e6
    print(f"  compress {tc:.3f} ms ({gbs:.0f} GB/s eq)", flush=True)
