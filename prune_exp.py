"""TPU experiment round 4: attribute prune/compress costs."""
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from sparsifyme_tpu.utils.timing import time_kernel
from sparsifyme_tpu.ops.prune import prune_nm
from sparsifyme_tpu.ops.kernels.prune_kernel import prune_nm_pallas
from sparsifyme_tpu.ops.sparse24 import compress_24, spmm_24
from sparsifyme_tpu.ops.gemm import batched_gemm

key = jax.random.PRNGKey(0)
m, n, k, b = 12544, 64, 576, 32
a = jax.random.normal(key, (b, m, k), jnp.bfloat16)
pruned = jax.jit(lambda x: prune_nm(x, 2, 4)[0])(a)

# pure transpose cost (compress input relayout)
def tr(x):
    return jnp.swapaxes(x.reshape(-1, k), 0, 1) * jnp.bfloat16(1.0)
tt = time_kernel(tr, (pruned,), iters=8).ms
print(f"transpose (401408x576): {tt:.3f} ms "
      f"({2*pruned.size*2/tt/1e6:.0f} GB/s)", flush=True)

for br, bkk in [(None, None), (2048, 128), (1024, 128), (2048, 256),
                (512, 640)]:
    tp = time_kernel(
        lambda x: prune_nm_pallas(x, 2, 4, block_rows=br, block_k=bkk),
        (pruned,), iters=8).ms
    print(f"prune br={br} bk={bkk}: {tp:.3f} ms "
          f"({3*pruned.size*2/tp/1e6:.0f} GB/s)", flush=True)

tc = time_kernel(compress_24, (pruned,), iters=8).ms
print(f"compress: {tc:.3f} ms", flush=True)

# spmm24 sanity for (196,2048,512) after vmem fix
m2, n2, k2 = 196, 2048, 512
a2 = jax.random.normal(key, (b, m2, k2), jnp.bfloat16)
bm2 = jax.random.normal(key, (k2, n2), jnp.bfloat16)
s2 = jax.jit(lambda x: compress_24(prune_nm(x, 2, 4)[0]))(a2)
tg = min(time_kernel(lambda x, y: batched_gemm(x, y, out_dtype=jnp.bfloat16),
                     (a2, bm2), carrier=1, iters=16).ms,
         time_kernel(lambda x, y: batched_gemm(x, y, out_dtype=jnp.bfloat16,
                                               fold=False),
                     (a2, bm2), carrier=1, iters=16).ms)
ts = time_kernel(lambda ss, y: spmm_24(ss, y, out_dtype=jnp.bfloat16),
                 (s2, bm2), carrier=1, iters=16).ms
print(f"(196,2048,512): gemm {tg:.3f} spmm24 {ts:.3f} "
      f"speedup {tg/ts:.2f}x", flush=True)
