"""TPU experiment round 5: compress/prune fixes + spmm24 cfg sweep."""
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from sparsifyme_tpu.utils.timing import time_kernel
from sparsifyme_tpu.ops.prune import prune_nm
from sparsifyme_tpu.ops.sparse24 import compress_24, spmm_24
from sparsifyme_tpu.ops.gemm import batched_gemm

key = jax.random.PRNGKey(0)
m, n, k, b = 12544, 64, 576, 32
a = jax.random.normal(key, (b, m, k), jnp.bfloat16)
pruned = jax.jit(lambda x: prune_nm(x, 2, 4)[0])(a)
tp = time_kernel(lambda x: prune_nm(x, 2, 4), (pruned,), iters=8).ms
print(f"prune k=576: {tp:.3f} ms ({3*pruned.size*2/tp/1e6:.0f} GB/s)",
      flush=True)
tc = time_kernel(compress_24, (pruned,), iters=8).ms
print(f"compress k=576: {tc:.3f} ms", flush=True)

for (m2, n2, k2) in [(196, 2048, 512), (784, 1024, 256)]:
    a2 = jax.random.normal(key, (b, m2, k2), jnp.bfloat16)
    bm2 = jax.random.normal(key, (k2, n2), jnp.bfloat16)
    s2 = jax.jit(lambda x: compress_24(prune_nm(x, 2, 4)[0]))(a2)
    flops = 2.0*m2*n2*k2*b
    tg = min(time_kernel(lambda x, y: batched_gemm(x, y, out_dtype=jnp.bfloat16),
                         (a2, bm2), carrier=1, iters=16).ms,
             time_kernel(lambda x, y: batched_gemm(x, y, out_dtype=jnp.bfloat16,
                                                   fold=False),
                         (a2, bm2), carrier=1, iters=16).ms)
    print(f"({m2},{n2},{k2}): gemm {tg:.3f} ({flops/tg/1e9:.0f} TF/s)",
          flush=True)
    for bmb, bnb in [(None, None), (1024, 512), (2048, 256), (1024, 256),
                     (512, 512)]:
        try:
            ts = time_kernel(
                lambda ss, y: spmm_24(ss, y, out_dtype=jnp.bfloat16,
                                      block_m=bmb, block_n=bnb),
                (s2, bm2), carrier=1, iters=16).ms
            print(f"  spmm24 bm={bmb} bn={bnb}: {ts:.3f} "
                  f"({flops/ts/1e9:.0f} TF/s) speedup {tg/ts:.2f}x",
                  flush=True)
        except Exception as e:
            print(f"  spmm24 bm={bmb} bn={bnb}: FAIL {type(e).__name__}",
                  flush=True)
