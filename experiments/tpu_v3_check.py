"""v3 (chunked ranking) timings: fused/prune/compress on key shapes."""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
import time
import jax
import jax.numpy as jnp
import numpy as np
from sparsifyme_tpu.ops.prune import prune_nm
from sparsifyme_tpu.ops.sparse24 import compress_24, prune_compress_24
from sparsifyme_tpu.utils.timing import time_kernel

print("backend:", jax.default_backend(), flush=True)
HBM = 780.0
t0 = time.time()

# quick parity on the real chip first
a = jax.random.normal(jax.random.PRNGKey(1), (2, 196, 147), jnp.bfloat16)
s_ref = jax.jit(lambda x: compress_24(prune_nm(x, 2, 4)[0]))(a)
s2 = jax.jit(prune_compress_24)(a)
ok = all(np.array_equal(np.asarray(x, np.float32), np.asarray(y, np.float32))
         for x, y in ((s2.values0, s_ref.values0), (s2.values1, s_ref.values1),
                      (s2.codes, s_ref.codes)))
print("parity k=147:", "OK" if ok else "FAIL", flush=True)

for b, m, k in ((32, 12544, 64), (32, 12544, 256), (32, 12544, 576),
                (32, 3136, 1152), (32, 196, 4608)):
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (b, m, k), jnp.bfloat16)
    rows = b * m
    dmb = rows * k * 2 / 1e6
    cmb = rows * k * 1.25 / 1e6
    t_f = time_kernel(prune_compress_24, (a,), carrier=0, iters=8, reps=3)
    pruned = jax.jit(lambda x: prune_nm(x, 2, 4)[0])(a)
    t_p = time_kernel(lambda x: prune_nm(x, 2, 4), (pruned,), carrier=0, iters=8, reps=3)
    print(f"  b={b} m={m} k={k}: fused={t_f.ms:.3f}ms "
          f"(x{t_f.ms/((dmb+cmb)/HBM):.2f}) prune={t_p.ms:.3f} "
          f"(x{t_p.ms/(3*dmb/HBM):.2f})", flush=True)
print(f"total {time.time()-t0:.0f}s", flush=True)
