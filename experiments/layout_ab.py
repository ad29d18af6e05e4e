"""A/B: FP kernel on compress_24-produced planes vs fresh device_put copies."""
import jax, jax.numpy as jnp, numpy as np
from sparsifyme_tpu.ops.prune import prune_nm
from sparsifyme_tpu.ops.sparse24 import compress_24
from sparsifyme_tpu.ops.kernels.spmm24_kernel import spmm24_pallas_fp
from sparsifyme_tpu.utils.timing import time_kernel

m, n, k, b = 3136, 128, 512, 32
key = jax.random.PRNGKey(0)
a = jax.random.normal(key, (b, m, k), jnp.bfloat16)
bm = jax.random.normal(key, (k, n), jnp.bfloat16)
pruned = jax.jit(lambda x: prune_nm(x, 2, 4)[0])(a)
s = jax.jit(compress_24)(pruned)
print("layouts:", s.values0.format, s.codes.format, flush=True)

fn = lambda v0, v1, c, y: spmm24_pallas_fp(
    v0, v1, c, y, k_logical=k, out_dtype=jnp.bfloat16)
t1 = time_kernel(fn, (s.values0, s.values1, s.codes, bm), carrier=3).ms
fresh = tuple(jax.device_put(np.asarray(x)) for x in
              (s.values0, s.values1, s.codes))
print("fresh layouts:", fresh[0].format, flush=True)
t2 = time_kernel(fn, (*fresh, bm), carrier=3).ms
print(f"compress-produced: {t1*1e3:.1f}us   fresh copies: {t2*1e3:.1f}us",
      flush=True)
