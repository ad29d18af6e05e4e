"""TPU experiment round 3: spmm24 cached/chunked + prune auto tiles."""
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from sparsifyme_tpu.utils.timing import time_kernel
from sparsifyme_tpu.ops.prune import prune_nm
from sparsifyme_tpu.ops.sparse24 import compress_24, spmm_24
from sparsifyme_tpu.ops.gemm import batched_gemm

key = jax.random.PRNGKey(0)
for (m, n, k, b) in [(12544, 64, 576, 32), (784, 1024, 256, 32),
                     (196, 2048, 512, 32), (784, 256, 2304, 32),
                     (196, 512, 4608, 32)]:
    a = jax.random.normal(key, (b, m, k), jnp.bfloat16)
    bm = jax.random.normal(key, (k, n), jnp.bfloat16)
    flops = 2.0*m*n*k*b
    pruned = jax.jit(lambda x: prune_nm(x, 2, 4)[0])(a)
    s = jax.jit(compress_24)(pruned)
    tg = min(
        time_kernel(lambda x, y: batched_gemm(x, y, out_dtype=jnp.bfloat16),
                    (a, bm), carrier=1, iters=16).ms,
        time_kernel(lambda x, y: batched_gemm(x, y, out_dtype=jnp.bfloat16,
                                              fold=False),
                    (a, bm), carrier=1, iters=16).ms)
    ts = time_kernel(lambda ss, y: spmm_24(ss, y, out_dtype=jnp.bfloat16),
                     (s, bm), carrier=1, iters=16).ms
    tp = time_kernel(lambda x: prune_nm(x, 2, 4), (pruned,), iters=8).ms
    tc = time_kernel(compress_24, (pruned,), iters=8).ms
    print(f"m={m} n={n} k={k}: gemm {tg:.3f} spmm24 {ts:.3f} "
          f"speedup {tg/ts:.2f}x | prune {tp:.3f} compress {tc:.3f}",
          flush=True)
