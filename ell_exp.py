"""TPU experiment: rectangular-block ELL vs dense on key shapes."""
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from sparsifyme_tpu.utils.timing import time_kernel
from sparsifyme_tpu.ops.ell import ell_from_dense, spmm_ell
from sparsifyme_tpu.ops.gemm import batched_gemm

key = jax.random.PRNGKey(0)
ru = lambda x, q: -(-x//q)*q
for (m, n, k) in [(12544, 64, 64), (12544, 64, 576), (3136, 512, 128),
                  (784, 256, 2304), (196, 2048, 512)]:
    b = 32
    a = jax.random.normal(key, (b, m, k), jnp.bfloat16)
    bmat = jax.random.normal(key, (k, n), jnp.bfloat16)
    flops = 2.0*m*n*k*b
    tg = min(time_kernel(lambda x, y: batched_gemm(x, y, out_dtype=jnp.bfloat16),
                         (a, bmat), carrier=1, iters=16).ms,
             time_kernel(lambda x, y: batched_gemm(x, y, out_dtype=jnp.bfloat16,
                                                   fold=False),
                         (a, bmat), carrier=1, iters=16).ms)
    bs, bkb = 128, 32
    kp, mp = ru(k, 2*bkb), ru(m, bs)
    ell = max(1, (kp // bkb) // 2)
    ap = jnp.pad(a, ((0,0),(0,mp-m),(0,kp-k)))
    bp = jnp.pad(bmat, ((0,kp-k),(0,0)))
    e = jax.jit(lambda x: ell_from_dense(x, block_size=bs, ell_blocks=ell,
                                         block_k=bkb))(ap)
    te = time_kernel(lambda ee, y: spmm_ell(ee, y, out_dtype=jnp.bfloat16),
                     (e, bp), carrier=1, iters=16).ms
    print(f"m={m} n={n} k={k}: gemm {tg:.3f} ell(bk32) {te:.3f} "
          f"speedup {tg/te:.2f}x", flush=True)
